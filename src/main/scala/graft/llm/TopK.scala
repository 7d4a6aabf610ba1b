package graft.llm

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k typed aggregation — the one operator in the engine that
  * warrants custom aggregation machinery (SURVEY.md §7.3): per-group
  * nearest-neighbor selection keeps a k-size buffer per partition and
  * merges buffers, so a group with millions of candidates never
  * materializes more than k rows per task. Composed with LSH bucketing
  * this is the ANN scale path: shuffle is (buckets x k), not candidates.
  *
  * Deterministic ordering: score desc, then id asc on ties.
  */
object TopK {

  case class Scored(id: Long, score: Double)

  final class TopKAgg(k: Int) extends Aggregator[Scored, Array[Scored], Array[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    override def zero: Array[Scored] = Array.empty

    override def reduce(buf: Array[Scored], in: Scored): Array[Scored] =
      if (buf.length < k) (buf :+ in).sortWith(better)
      else if (better(in, buf.last)) (buf.dropRight(1) :+ in).sortWith(better)
      else buf

    override def merge(b1: Array[Scored], b2: Array[Scored]): Array[Scored] =
      (b1 ++ b2).sortWith(better).take(k)

    override def finish(r: Array[Scored]): Array[Scored] = r

    override def bufferEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Scored]] = ExpressionEncoder()
  }

  /** Column-callable top-k: `topK(5)(col("id"), col("score"))` -> array of
    * (id, score) structs ordered best-first. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAgg(k), Encoders.product[Scored])
}
