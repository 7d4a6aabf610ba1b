package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.SketchStream

/** Streaming sketch maintenance (q127's machinery): the state is
  * SUMMARY-sized however the corpus grows, streamed folds answer the
  * batch build exactly, and replays are absorbed. */
class SketchStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs: DataFrame = graft.core.Tables.load(spark, sf, "documents")

  private def reportOf(state: String): Seq[(String, Double, Double)] =
    SketchStream.report(spark, state).orderBy("source")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq

  test("split folds == one fold, state stays summary-sized, replay absorbed") {
    val split = java.nio.file.Files.createTempDirectory("sk_split").toString
    SketchStream.foldBatch(docs.filter(col("doc_id") < 250), split)
    SketchStream.foldBatch(docs.filter(col("doc_id") >= 250), split)
    val whole = java.nio.file.Files.createTempDirectory("sk_whole").toString
    SketchStream.foldBatch(docs, whole)
    val a = reportOf(split)
    assert(a == reportOf(whole), "streamed != batch")
    assert(a.size == 20)

    // boundedness: <= k hashes and <= 2^p registers per source — the
    // property that lets the fold skip the bucketed-probe machinery
    val nSources = 20
    assert(spark.read.parquet(s"$split/kmin").count() <= nSources * 256L)
    assert(spark.read.parquet(s"$split/hll").count() <= nSources * 512L)

    // a replayed batch changes nothing (k-min union and register max
    // absorb duplicates)
    SketchStream.foldBatch(docs.filter(col("doc_id") < 250), split)
    assert(reportOf(split) == a, "replay changed the report")
  }

  test("estimates track the growing corpus monotonically in coverage") {
    val state = java.nio.file.Files.createTempDirectory("sk_grow").toString
    SketchStream.foldBatch(docs.filter(col("doc_id") < 100), state)
    val small = reportOf(state).map(r => r._1 -> r._2).toMap
    SketchStream.foldBatch(docs.filter(col("doc_id") >= 100), state)
    val big = reportOf(state).map(r => r._1 -> r._2).toMap
    // KMV estimates never shrink as the set grows: the k-th smallest
    // hash can only move down, the estimate up (or stay, below k)
    big.foreach { case (src, est) =>
      assert(est >= small(src) - 1e-9, s"$src shrank: ${small(src)} -> $est")
    }
  }
}
