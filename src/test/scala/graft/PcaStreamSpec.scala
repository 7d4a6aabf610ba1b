package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.PcaStream

/** Streaming moment maintenance (q134's machinery): summary-sized
  * state, stream == batch, replays absorbed by the in-frame ledger. */
class PcaStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def emb: DataFrame = graft.core.Tables.load(spark, sf, "embeddings")

  test("split folds answer the batch moments; replay is absorbed; state bounded") {
    val state = java.nio.file.Files.createTempDirectory("pca_st").toString
    PcaStream.foldBatch(emb.filter(col("vec_id") < 200), "embedding", "a", state)
    PcaStream.foldBatch(emb.filter(col("vec_id") >= 200), "embedding", "b", state)
    // replay of an already-folded batch id must be a no-op
    PcaStream.foldBatch(emb.filter(col("vec_id") < 200), "embedding", "a", state)

    val streamed = PcaStream.moments(spark, state)
    val batch = graft.llm.Pca.moments(emb, "embedding")
    assert(streamed.n == batch.n, "count diverged (replay double-counted?)")
    val gd = streamed.g.zip(batch.g).map { case (a, b) => math.abs(a - b) }.max
    assert(gd < 1e-6 * batch.n, s"gram cells diverged by $gd")

    val d = graft.llm.Pca.dim
    val rows = spark.read.parquet(s"$state/moments").count()
    assert(rows == d * d + d + 1 + 2, s"state not summary-sized: $rows rows")

    // the report equals the batch principal at the oracle rounding
    val vb = graft.llm.Pca.principal(batch)._2.map(x =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val vs = PcaStream.report(spark, state)
      .orderBy("dim").collect().map(_.getDouble(1))
    assert(vb.toSeq == vs.toSeq, "streamed loadings != batch loadings")
  }

  test("an empty batch still records its ledger row") {
    val state = java.nio.file.Files.createTempDirectory("pca_empty").toString
    PcaStream.foldBatch(emb.limit(0), "embedding", "e0", state)
    val bids = spark.read.parquet(s"$state/moments")
      .filter(col("kind") === "batch").select("bid")
      .collect().map(_.getString(0)).toSet
    assert(bids == Set("e0"))
    PcaStream.foldBatch(emb.filter(col("vec_id") < 100), "embedding", "e1", state)
    assert(PcaStream.moments(spark, state).n == 100)
  }
}
