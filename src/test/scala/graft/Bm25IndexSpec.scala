package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.Bm25Index

/** Streaming BM25 index maintenance (q129's machinery): the folded
  * index answers exactly what the batch retrieval answers, replay is
  * absorbed per state table AND in the ledgered workload summary, the
  * scoring probe partition-prunes to the workload terms' buckets, the
  * query path never scans the corpus-sized stores outside the probe,
  * and empty-token documents still count toward the corpus scalars. */
class Bm25IndexSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def docs: DataFrame = graft.core.Tables.load(spark, sf, "documents")

  private def topkOf(state: String): Seq[(Long, Long, Double)] =
    Bm25Index.topK(spark, state).orderBy("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("two streamed folds answer exactly the batch q128 retrieval") {
    val state = java.nio.file.Files.createTempDirectory("bm_split").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", state)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", state)
    val batch = SparkEntry.queries("q128_bm25_topk")(spark, sf)
      .orderBy("query_id", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val streamed = topkOf(state)
    assert(streamed == batch, "streamed index != batch retrieval")
    assert(streamed.size == 25 && streamed.map(_._1).distinct.size == 5)
  }

  test("a replayed batch is absorbed in BOTH state tables and the summary ledger") {
    val state = java.nio.file.Files.createTempDirectory("bm_replay").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", state)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", state)
    val before = topkOf(state)
    def dfsum = spark.read.parquet(s"$state/dfsum")
    val postBefore = spark.read.parquet(s"$state/postings").count()
    val docsBefore = spark.read.parquet(s"$state/docs").count()
    val sumBefore = dfsum.filter(col("kind") =!= "batch")
      .collect().map(_.toString).sorted.toSeq
    // foreachBatch redelivery: SAME batch id → ledger hit, nothing moves
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", state)
    assert(spark.read.parquet(s"$state/postings").count() == postBefore,
      "replayed postings were re-appended")
    assert(spark.read.parquet(s"$state/docs").count() == docsBefore,
      "replayed docs were re-appended")
    assert(dfsum.filter(col("kind") =!= "batch")
      .collect().map(_.toString).sorted.toSeq == sumBefore,
      "same-bid replay changed the df summary")
    // re-ingest of already-seen content under a NEW batch id: the
    // novelty guards yield empty deltas, so the summary folds zeros —
    // counters unchanged, one more ledger row
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b2", state)
    assert(spark.read.parquet(s"$state/postings").count() == postBefore)
    assert(dfsum.filter(col("kind") =!= "batch")
      .collect().map(_.toString).sorted.toSeq == sumBefore,
      "re-ingested content under a new bid changed the df summary")
    assert(dfsum.filter(col("kind") === "batch").count() == 3)
    assert(topkOf(state) == before)
  }

  test("the batch-id ledger is capped to the replay horizon; pre-seq snapshots migrate") {
    val state = java.nio.file.Files.createTempDirectory("bm_horizon").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", state)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", state)
    val p = s"$state/dfsum"
    def snap = spark.read.parquet(p)
    val countersBefore = snap.filter(col("kind") =!= "batch")
      .collect().map(_.toString).sorted.toSeq
    // ledger rows carry the fold counter the cap orders by
    assert(snap.filter(col("kind") === "batch").select("bid", "seq")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b0", 0L), ("b1", 1L)))

    // age the state to the horizon boundary: hand-seed 63 more ledger
    // rows (seq 2..64) so the NEXT fold lands at seq 65 and must prune
    // everything at seq <= 1 — including b0
    val aged = graft.core.Staging.stage(snap.unionByName(
      spark.range(2, 65).selectExpr("CAST(null AS STRING) AS term",
        "CAST(null AS BIGINT) AS df", "CAST(null AS BIGINT) AS nd",
        "CAST(null AS BIGINT) AS sumdl", "'batch' AS kind",
        "concat('syn', id) AS bid", "id AS seq")))
    graft.sinks.Sinks.snapshotSwap(aged.repartition(1), p, Seq.empty)
    // a fold with no new content under a fresh id: counters unchanged,
    // ledger gains seq 65 and sheds everything below seq 2 (horizon 64)
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b2", state)
    val ledger = snap.filter(col("kind") === "batch").select("bid", "seq")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ledger("b2") == 65L)
    assert(!ledger.contains("b0") && !ledger.contains("b1"),
      s"rows below the horizon were kept: ${ledger.keySet}")
    assert(ledger.size == 64, s"ledger not capped: ${ledger.size}")
    assert(snap.filter(col("kind") =!= "batch")
      .collect().map(_.toString).sorted.toSeq == countersBefore,
      "capping the ledger moved the counters")
    // inside the horizon, replay is still absorbed
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b2", state)
    assert(snap.filter(col("kind") === "batch").count() == 64)

    // a pre-`seq` snapshot (earlier engine version) folds clean: its
    // ledger rows read as seq 0 and the new fold takes seq 1
    val legacy = java.nio.file.Files.createTempDirectory("bm_preseq").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", legacy)
    val noSeq = graft.core.Staging.stage(
      spark.read.parquet(s"$legacy/dfsum").drop("seq"))
    graft.sinks.Sinks.snapshotSwap(noSeq.repartition(1), s"$legacy/dfsum",
      Seq.empty)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", legacy)
    assert(spark.read.parquet(s"$legacy/dfsum")
      .filter(col("kind") === "batch").select("bid", "seq")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("b0", 0L), ("b1", 1L)))
    // and the migrated state still answers the two-fold retrieval
    val ref = java.nio.file.Files.createTempDirectory("bm_preseq_ref").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", ref)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", ref)
    assert(topkOf(legacy) == topkOf(ref))
  }

  test("a vocabulary past the shard target swaps as multiple files, answering identically") {
    // reference: default (single-file) snapshot
    val ref = java.nio.file.Files.createTempDirectory("bm_shard_ref").toString
    Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", ref)
    Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", ref)
    // tiny shard target: the second fold sees a non-empty snapshot whose
    // bytes exceed the target, so its swap must shard by term hash —
    // same atomic publish, >1 data file
    val state = java.nio.file.Files.createTempDirectory("bm_shard").toString
    spark.conf.set("spark.graft.bm25.dfsumShardBytes", "1024")
    try {
      Bm25Index.foldBatch(docs.filter(col("doc_id") < 250), "b0", state)
      Bm25Index.foldBatch(docs.filter(col("doc_id") >= 250), "b1", state)
    } finally spark.conf.unset("spark.graft.bm25.dfsumShardBytes")
    val files = new java.io.File(s"$state/dfsum").listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(files > 1, s"snapshot did not shard: $files file(s)")
    assert(topkOf(state) == topkOf(ref),
      "sharded summary changed the retrieval")
    // counters and ledger still ride ONE snapshot: same rows either way
    def all(p: String) = spark.read.parquet(s"$p/dfsum")
      .collect().map(_.toString).sorted.toSeq
    assert(all(state) == all(ref))
  }

  test("the scoring probe partition-prunes; NO unpruned scan of the posting store") {
    val state = java.nio.file.Files.createTempDirectory("bm_prune").toString
    Bm25Index.foldBatch(docs, "b0", state)
    val plan = Bm25Index.topK(spark, state)
      .queryExecution.executedPlan.toString
    // the round-12 weak was a query-time df pass over the UNPRUNED
    // posting store: now every postings scan in the query plan must
    // carry a non-empty partition filter on tb (the workload derives
    // from the maintained summary, which lives elsewhere)
    val scans = plan.split("\n").filter(_.contains("/postings"))
      .filter(_.contains("PartitionFilters"))
    assert(scans.nonEmpty, s"no postings scan found in plan:\n${plan.take(2000)}")
    assert(scans.forall(l => "PartitionFilters: \\[([^\\]]+)\\]".r
        .findFirstMatchIn(l).exists(_.group(1).trim.nonEmpty)),
      s"an UNPRUNED postings scan survives in the query path:\n${plan.take(3000)}")
  }

  test("query-path input bytes stay ~flat as the index grows with off-workload postings") {
    // the ShuffleGrowthSpec idiom applied to read IO: grow the index
    // ~8x with junk documents whose (unique, df=1) terms hash OUTSIDE
    // the workload terms' buckets — the workload is unchanged (junk df
    // sits far below the top-25 cut) and the PRUNED probe reads the
    // same buckets, so with the maintained summary the query path's
    // input bytes barely move; the round-12 df re-derivation would have
    // re-scanned the whole (now 8x) posting store per query.
    def measureRead(body: => Unit): Long = {
      val bytes = new AtomicLong
      val listener = new SparkListener {
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) bytes.addAndGet(m.inputMetrics.bytesRead)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        var prev = -1L
        var cur = bytes.get
        while (cur != prev) { Thread.sleep(400); prev = cur; cur = bytes.get }
        cur
      } finally spark.sparkContext.removeSparkListener(listener)
    }
    val state = java.nio.file.Files.createTempDirectory("bm_flat").toString
    Bm25Index.foldBatch(docs, "b0", state)
    // workload term buckets, from the maintained summary (same hash the
    // store buckets by)
    val qb = graft.llm.Bm25.workload(
        spark.read.parquet(s"$state/dfsum").filter(col("kind") === "df")
          .select("term", "df"),
        spark.read.parquet(s"$state/dfsum").filter(col("kind") === "scalar")
          .select("nd", "sumdl"))
      .select(pmod(xxhash64(col("term")), lit(32)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val base = measureRead { Bm25Index.topK(spark, state).count() }
    // junk docs: 6 unique terms each, filtered to non-workload buckets
    import spark.implicits._
    val jt = (0 until 40000).map(i => s"zq${i}x").toDF("term")
      .withColumn("b", pmod(xxhash64(col("term")), lit(32)).cast("int"))
      .filter(!col("b").isin(qb.toSeq: _*))
      .select("term").as[String].collect()
    val perDoc = 6
    val junkDocs = jt.grouped(perDoc).zipWithIndex
      .map { case (ts, i) => (1000000L + i, ts.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    Bm25Index.foldBatch(junkDocs, "b1", state)
    val rowsBase = docs.count()
    val rowsNow = spark.read.parquet(s"$state/docs").count()
    assert(rowsNow >= rowsBase * 8, s"junk growth too small: $rowsBase -> $rowsNow")
    val grown = measureRead { Bm25Index.topK(spark, state).count() }
    info(f"query-path bytes base=$base grown=$grown ratio=${grown.toDouble / base}%.2f")
    assert(grown <= base * 3,
      s"query-path input bytes grew with the index: $base -> $grown " +
        "(the workload must derive from the summary, the probe from pruned buckets)")
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
    Bm25Index.foldBatch(withEmpty.filter(col("doc_id") < 250), "b0", state)
    Bm25Index.foldBatch(withEmpty.filter(col("doc_id") >= 250), "b1", state)
    val d = spark.read.parquet(s"$state/docs")
    assert(d.filter(col("doc_id") === 900000L && col("dl") === 0L).count() == 1,
      "empty-token doc missing from the docs store")
    assert(spark.read.parquet(s"$state/postings")
      .filter(col("doc_id") === 900000L).isEmpty)
    // the maintained scalars agree with the docs store they summarize
    val sc = spark.read.parquet(s"$state/dfsum")
      .filter(col("kind") === "scalar").head()
    assert(sc.getLong(2) == d.count(), "summary nd != docs store rows")
    assert(sc.getLong(3) == d.agg(sum("dl")).head().getLong(0),
      "summary sumdl != docs store sum")
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
