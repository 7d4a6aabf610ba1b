package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.EventReports

/** Stream == batch for the incremental q108/q109 reports: folding the
  * event log through EventReports in micro-batches — in REVERSED time
  * order too, the case that exercises the order-insensitivity claim —
  * must reproduce the batch query outputs exactly, and replay +
  * compaction must change nothing.
  */
class EventReportsStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def events = Tables.load(spark, sf, "events")
    .select("user_id", "ts", "event_type")

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  private def batchReports = (
    rows(SparkEntry.queries("q108_retention")(spark, sf)),
    rows(SparkEntry.queries("q109_rolling_active")(spark, sf)))

  test("reversed-arrival folds reproduce the batch q108/q109 reports") {
    val ev = events
    val cut = ev.agg(avg(unix_micros(col("ts").cast("timestamp"))))
      .collect()(0).getDouble(0).toLong
    val late = ev.filter(unix_micros(col("ts").cast("timestamp")) >= cut)
    val early = ev.filter(unix_micros(col("ts").cast("timestamp")) < cut)
    val state = java.nio.file.Files.createTempDirectory("evrep-rev").toString
    // newer half first: a time-ordered design (e.g. one keyed on "first
    // seen") would mis-assign cohorts; the min/distinct folds cannot
    EventReports.foldBatch(late, state)
    EventReports.foldBatch(early, state)
    val (wantR, wantW) = batchReports
    assert(rows(EventReports.retention(spark, state)) === wantR)
    assert(rows(EventReports.rollingActive(spark, state)) === wantW)
  }

  test("replayed folds and compaction change neither report") {
    val ev = events
    val half = ev.filter(col("user_id") % 2 === 0)
    val rest = ev.filter(col("user_id") % 2 === 1)
    val state = java.nio.file.Files.createTempDirectory("evrep-replay").toString
    EventReports.foldBatch(half, state)
    EventReports.foldBatch(half, state) // at-least-once redelivery
    EventReports.foldBatch(rest, state)
    EventReports.compactState(spark, state)
    // compaction collapses cohort candidate history to one row per user
    val cohortRows = spark.read.parquet(s"$state/cohorts")
    assert(cohortRows.count() ===
      cohortRows.select("user_id").distinct().count())
    val (wantR, wantW) = batchReports
    assert(rows(EventReports.retention(spark, state)) === wantR)
    assert(rows(EventReports.rollingActive(spark, state)) === wantW)
  }

  test("sink drains a file stream through the fold (checkpointed wiring)") {
    val ev = events
    val in = java.nio.file.Files.createTempDirectory("evrep-in").toString
    ev.filter(col("user_id") % 2 === 0).coalesce(1)
      .write.mode("append").parquet(in)
    Thread.sleep(1100)
    ev.filter(col("user_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val state = java.nio.file.Files.createTempDirectory("evrep-state").toString
    val q = EventReports.sink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(in),
      state,
      java.nio.file.Files.createTempDirectory("evrep-ckpt").toString)
    assert(q.awaitTermination(120000), "stream did not drain in time")
    val (wantR, wantW) = batchReports
    assert(rows(EventReports.retention(spark, state)) === wantR)
    assert(rows(EventReports.rollingActive(spark, state)) === wantW)
  }

  test("a crash between append and compaction replays to the same reports") {
    // the compaction-cadence crash window: batch k's appends landed, the
    // scheduled compaction did NOT run (or died mid-swap). foreachBatch
    // redelivers batch k on restart, appends land AGAIN, and the next
    // compaction collapses everything — both reports must equal the
    // crash-free run's. This is the CorpusStream replay discipline
    // crash-REPLAYED rather than argued from duplicate absorption.
    val ev = events
    val b1 = ev.filter(col("user_id") % 3 === 0)
    val b2 = ev.filter(col("user_id") % 3 === 1)
    val b3 = ev.filter(col("user_id") % 3 === 2)
    val state = java.nio.file.Files.createTempDirectory("evrep-crash").toString
    EventReports.foldBatch(b1, state)
    EventReports.foldBatch(b2, state)
    // -- crash here: compaction due after b2 never ran; additionally a
    // compaction that died BEFORE its atomic rename leaves a stale
    // __tmp staging dir, which the next snapshotSwap must overwrite
    spark.read.parquet(s"$state/cohorts")
      .write.mode("overwrite").parquet(s"$state/cohorts__tmp")
    // -- restart: b2 redelivered, then the stream proceeds and compacts
    EventReports.foldBatch(b2, state)
    EventReports.foldBatch(b3, state)
    EventReports.compactState(spark, state)
    assert(!new java.io.File(s"$state/cohorts__tmp").exists(),
      "compaction must clear the crash-era staging dir")
    val (wantR, wantW) = batchReports
    assert(rows(EventReports.retention(spark, state)) === wantR,
      "retention after crash-replay must equal the crash-free report")
    assert(rows(EventReports.rollingActive(spark, state)) === wantW,
      "rolling WAU after crash-replay must equal the crash-free report")
  }
}
