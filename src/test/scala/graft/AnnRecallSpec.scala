package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Recall of the approximate ANN paths against exact brute force.
  *
  * q53 (random-projection buckets + Hamming-1 multi-probe) and q57
  * (IVF cells, nprobe=2) verify against a FIXED oracle in CORRECTNESS,
  * but that only pins determinism — it says nothing about how much of
  * the true neighborhood the index finds. This spec quantifies it:
  * recall@5 averaged over the query vectors, floored. Multi-probe is
  * what buys the bucketed path its floor (single-bucket probing loses
  * near-boundary neighbors); nprobe=2 plays the same role for IVF.
  */
class AnnRecallSpec extends SparkSpec {

  // sf0.01: 500 vectors. At sf0.001 (50 vectors) the 64 buckets are
  // almost all singletons and recall measures bucket sparsity, not index
  // quality; 500 vectors give the occupancy the index is designed for.
  private val dir = "/root/testdata/sf0.01"

  /** Exact cosine top-5 per query vector (vec_id < 5, self excluded). */
  private lazy val truth: Map[Long, Set[Long]] = {
    graft.plans.VectorDot.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .withColumn("norm", sqrt(expr("vector_dot(embedding, embedding)")))
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("norm").as("qn"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("vec_id"))
    emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score",
        expr("vector_dot(embedding, qv)") / (col("norm") * col("qn")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select("query_id", "vec_id")
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recallAt5(queryName: String): Double = {
    val found = SparkEntry.queries(queryName)(spark, dir)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val perQuery = truth.map { case (qid, trueSet) =>
      found.getOrElse(qid, Set.empty).intersect(trueSet).size.toDouble / trueSet.size
    }
    perQuery.sum / perQuery.size
  }

  test("bucketed multi-probe ANN (q53) recall@5 >= 0.8") {
    val r = recallAt5("q53_ann_topk")
    assert(r >= 0.8, s"q53 recall@5 = $r, needs >= 0.8")
  }

  test("IVF nprobe=2 ANN (q57) recall@5 >= 0.8") {
    val r = recallAt5("q57_ivf_topk")
    assert(r >= 0.8, s"q57 recall@5 = $r, needs >= 0.8")
  }
}
