package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Recall of the approximate ANN paths against exact brute force.
  *
  * q53 (random-projection buckets + Hamming≤2 multi-probe) and q57
  * (IVF cells, nprobe=2) verify against a FIXED oracle in CORRECTNESS,
  * but that only pins determinism — it says nothing about how much of
  * the true neighborhood the index finds. This spec quantifies it:
  * recall@5 averaged over the query vectors, floored — at BOTH sf0.01
  * (500 vectors) and sf0.1 (5 000 vectors), because the plane knob is
  * corpus-size-derived (occupancy ≈ N/2^planes): a floor measured at
  * one scale says nothing about the re-parameterized index at the next.
  */
class AnnRecallSpec extends SparkSpec {

  // sf0.001 (50 vectors) is excluded: its 4 buckets are almost all
  // singletons and recall would measure fixture sparsity, not index
  // quality. 500 and 5 000 vectors exercise the occupancy the knob
  // targets, one octave of corpus growth apart.
  private val dirs = Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")

  /** Exact cosine top-5 per query vector (vec_id < 5, self excluded). */
  private def truth(dir: String): Map[Long, Set[Long]] = {
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

  private def recallAt5(queryName: String, dir: String, exact: Map[Long, Set[Long]]): Double = {
    val found = SparkEntry.queries(queryName)(spark, dir)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val perQuery = exact.map { case (qid, trueSet) =>
      found.getOrElse(qid, Set.empty).intersect(trueSet).size.toDouble / trueSet.size
    }
    perQuery.sum / perQuery.size
  }

  test("plane knob resolves to the oracle's constant at the oracle scale factor") {
    // the q53/q54 oracle SQL hardcodes 4 planes; the derived knob must
    // agree where the oracle runs, or CORRECTNESS compares different indexes
    assert(graft.queries.Llm.annPlanesFor(spark, "/root/testdata/sf0.01") === 4)
  }

  dirs.foreach { dir =>
    test(s"bucketed multi-probe ANN (q53) recall@5 >= 0.8 at $dir") {
      val r = recallAt5("q53_ann_topk", dir, truth(dir))
      assert(r >= 0.8, s"q53 recall@5 = $r at $dir, needs >= 0.8")
    }

    test(s"IVF nprobe=2 ANN (q57) recall@5 >= 0.8 at $dir") {
      val r = recallAt5("q57_ivf_topk", dir, truth(dir))
      assert(r >= 0.8, s"q57 recall@5 = $r at $dir, needs >= 0.8")
    }
  }
}
