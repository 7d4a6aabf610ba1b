package graft

import org.apache.spark.sql.functions._
import graft.llm.TopK

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("bounded top-k keeps the k best, ordered score desc then id asc") {
    val df = Seq(
      ("g1", 1L, 0.9), ("g1", 2L, 0.5), ("g1", 3L, 0.7), ("g1", 4L, 0.7),
      ("g2", 5L, 0.1)
    ).toDF("g", "id", "score")
    val topk = TopK.topK(2)
    val out = df.groupBy("g").agg(topk(col("id"), col("score")).as("nn"))
      .select(col("g"), explode(col("nn")).as("n"))
      .select(col("g"), col("n.id"), col("n.score"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.filter(_._1 == "g1").toSeq === Seq(("g1", 1L, 0.9), ("g1", 3L, 0.7)))
    assert(out.filter(_._1 == "g2").toSeq === Seq(("g2", 5L, 0.1)))
  }

  test("buffer never exceeds k across partitions (merge path)") {
    val df = (1L to 10000L).map(i => ("g", i, i.toDouble)).toDF("g", "id", "score")
      .repartition(8)
    val topk = TopK.topK(3)
    val out = df.groupBy("g").agg(topk(col("id"), col("score")).as("nn"))
      .select(explode(col("nn")).as("n")).select(col("n.id")).as[Long].collect()
    assert(out.toSeq === Seq(10000L, 9999L, 9998L))
  }
}
