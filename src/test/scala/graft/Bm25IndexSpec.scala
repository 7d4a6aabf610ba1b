package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Bm25Index

/** Streaming BM25 index maintenance (q129's machinery): the folded
  * index answers exactly what the batch retrieval answers, replay is
  * absorbed per state table, the scoring probe partition-prunes to the
  * workload terms' buckets, and empty-token documents still count
  * toward the corpus scalars. */
class Bm25IndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs: DataFrame = graft.core.Tables.load(spark, sf, "documents")

  private def topkOf(state: String): Seq[(Long, Long, Double)] =
    Bm25Index.topK(spark, state).orderBy("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("two streamed folds answer exactly the batch q128 retrieval") {
    val state = java.nio.file.Files.createTempDirectory("bm_split").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), state)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), state)
    val batch = SparkEntry.queries("q128_bm25_topk")(spark, sf)
      .orderBy("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val streamed = topkOf(state)
    assert(streamed == batch, "streamed index != batch retrieval")
    assert(streamed.size == 25 && streamed.map(_._1).distinct.size == 5)
  }

  test("a replayed batch is absorbed in BOTH state tables") {
    val state = java.nio.file.Files.createTempDirectory("bm_replay").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), state)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), state)
    val before = topkOf(state)
    val postBefore = spark.read.parquet(s"$state/postings").count()
    val docsBefore = spark.read.parquet(s"$state/docs").count()
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), state) // replay
    assert(spark.read.parquet(s"$state/postings").count() == postBefore,
      "replayed postings were re-appended")
    assert(spark.read.parquet(s"$state/docs").count() == docsBefore,
      "replayed docs were re-appended")
    assert(topkOf(state) == before)
  }

  test("the scoring probe partition-prunes the posting store") {
    val state = java.nio.file.Files.createTempDirectory("bm_prune").toString
    Bm25Index.foldBatch(docs, state)
    val plan = Bm25Index.topK(spark, state)
      .queryExecution.executedPlan.toString
    // the PRUNED scan carries a non-empty isin predicate on tb; the
    // workload's own df pass legitimately reads the store whole, so
    // require at least one pruned scan rather than all-pruned
    val pf = "PartitionFilters: \\[([^\\]]+)\\]".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(pf.exists(f => f.contains("tb") && f.trim.nonEmpty),
      s"no partition-pruning predicate on 'tb' in plan:\n${plan.take(2000)}")
  }

  test("empty-token docs count toward scalars; cold index answers empty; compaction preserves") {
    val state = java.nio.file.Files.createTempDirectory("bm_edge").toString
    assert(Bm25Index.topK(spark, state).isEmpty,
      "querying before the first fold should answer empty, not throw")
    // an empty-text doc contributes (nd += 1, sumdl += 0) exactly as the
    // batch pass counts it — fold one in alongside the corpus and check
    // the docs store carries it with dl = 0 and no posting rows
    val withEmpty = docs.select(col("doc_id"), col("text"))
      .unionByName(spark.range(1).select(
        lit(900000L).as("doc_id"), lit("   ").as("text")))
    // two folds so each bucket holds >1 file — gives compaction
    // something to coalesce
    Bm25Index.foldBatch(withEmpty.filter(col("doc_id") < 250), state)
    Bm25Index.foldBatch(withEmpty.filter(col("doc_id") >= 250), state)
    val d = spark.read.parquet(s"$state/docs")
    assert(d.filter(col("doc_id") === 900000L && col("dl") === 0L).count() == 1,
      "empty-token doc missing from the docs store")
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id") === 900000L).isEmpty)
    val before = topkOf(state)
    def files = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(state))
        .iterator().asScala.count(_.toString.endsWith(".parquet"))
    }
    val nBefore = files
    Bm25Index.compact(spark, state)
    assert(files < nBefore, s"compaction did not reduce the $nBefore files")
    assert(topkOf(state) == before, "compaction changed answers")
  }
}
