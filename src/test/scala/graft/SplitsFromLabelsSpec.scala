package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.ClusterMaintenance

/** Pins the production split path (`ClusterMaintenance.splitsFromLabels`,
  * which consumes the PERSISTED labeling the streaming fold maintains)
  * against q91's self-contained output (which re-clusters from scratch):
  * after folding the same corpus through foldBatch ingests, the two must
  * assign byte-identical (doc_id, group_id, split) rows — the
  * stream-maintained label table is a drop-in replacement for the
  * re-cluster, which is the whole point of maintaining it.
  */
class SplitsFromLabelsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("splitsFromLabels == q91 after foldBatch ingests of the same corpus") {
    val state = java.nio.file.Files
      .createTempDirectory("graft_splits_state").toString
    val docs = Tables.load(spark, dir, "documents")
    ClusterMaintenance.foldBatch(docs.filter(col("doc_id") < 250), state)
    ClusterMaintenance.foldBatch(docs.filter(col("doc_id") >= 250), state)

    val prod = ClusterMaintenance.splitsFromLabels(docs, state)
      .orderBy("doc_id").collect().toSeq
    val q91 = SparkEntry.queries("q91_leakage_safe_splits")(spark, dir)
      .collect().toSeq
    assert(prod === q91)

    // the invariant both paths exist for: one split per cluster
    val splitsPerGroup = ClusterMaintenance.splitsFromLabels(docs, state)
      .groupBy("group_id").agg(countDistinct("split").as("n"))
      .agg(max("n")).head.getLong(0)
    assert(splitsPerGroup === 1L)
  }

  test("splitsFromLabels with no persisted state degrades to singleton groups") {
    val state = java.nio.file.Files
      .createTempDirectory("graft_splits_empty").toString
    val docs = Tables.load(spark, dir, "documents").limit(20)
    val out = ClusterMaintenance.splitsFromLabels(docs, state).collect()
    assert(out.length === 20)
    // no labels → every doc is its own group, split still deterministic
    out.foreach(r => assert(r.getLong(1) === r.getLong(0)))
  }
}
