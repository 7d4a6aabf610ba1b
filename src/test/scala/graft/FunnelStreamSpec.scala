package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.Funnel

/** Streaming funnel vs an INDEPENDENT driver-side min-chain model (the
  * q107 oracle's formulation, not the operator's own fold) — including
  * the case the operator exists for: events arriving out of order
  * across micro-batches, within the watermark.
  */
class FunnelStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val windowUs = 24L * 3600 * 1000000 // q107's 24 h step window

  private def eventRows: Seq[(Long, Long, String)] = {
    val ev = Tables.load(spark, sf, "events")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("tu"), col("event_type"))
    ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
  }

  /** Independent earliest-completion model: chained mins, not a fold. */
  private def model(evs: Seq[(Long, Long, String)])
      : Map[Long, (Option[Long], Option[Long], Option[Long])] =
    evs.groupBy(_._1).map { case (uid, es) =>
      def firstOf(tp: String, after: Option[Long]): Option[Long] = after.flatMap { t =>
        val in = es.filter(e => e._3 == tp && e._2 > t && e._2 <= t + windowUs)
        if (in.isEmpty) None else Some(in.map(_._2).min)
      }
      val t1 = { val v = es.filter(_._3 == "view"); if (v.isEmpty) None else Some(v.map(_._2).min) }
      val t2 = firstOf("click", t1)
      val t3 = firstOf("purchase", t2)
      uid -> ((t1, t2, t3))
    }

  private def runStream(batches: Seq[Seq[(Long, Long, String)]],
                        delay: String, name: String): Map[Long, (Option[Long], Option[Long], Option[Long])] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"funnel-$name").toString
    batches.zipWithIndex.foreach { case (b, i) =>
      b.toDF("user_id", "tu", "event_type")
        .withColumn("ts", timestamp_micros(col("tu")).cast("timestamp_ntz"))
        .select("user_id", "ts", "event_type")
        .coalesce(1).write.parquet(s"$dir/b$i")
    }
    val schema = spark.read.parquet(s"$dir/b0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    val q = Funnel.track(stream, windowUs, delay)
      .writeStream.format("memory").queryName(s"funnel_$name")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"funnel-ckpt-$name").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    spark.table(s"funnel_$name").collect()
      .groupBy(_.getLong(0))
      .map { case (uid, rows) =>
        // the documented consumer key: newest (last_us, rev) wins
        val last = rows.maxBy(r => (r.getAs[Long]("last_us"), r.getAs[Long]("rev")))
        def opt(i: Int) = if (last.isNullAt(i)) None else Some(last.getLong(i))
        uid -> ((opt(1), opt(2), opt(3)))
      }
  }

  test("reversed-arrival micro-batches still converge to the batch funnel") {
    val evs = eventRows
    val cut = evs.map(_._2).sorted.apply(evs.size / 2)
    // batch 1 = the NEWER half, batch 2 = the older half: every stage's
    // true ordering is only reconstructible because events hold in state
    // until sealed — a fold-on-arrival design would misassign stages
    val late = evs.filter(_._2 >= cut)
    val early = evs.filter(_._2 < cut)
    val got = runStream(Seq(late, early), "365 days", "rev")
    assert(got === model(evs))
  }

  test("ordered arrival with an active watermark seals and still matches") {
    val evs = eventRows
    val cut = evs.map(_._2).sorted.apply(evs.size / 2)
    val got = runStream(
      Seq(evs.filter(_._2 < cut), evs.filter(_._2 >= cut)), "2 days", "ord")
    assert(got === model(evs))
  }

  test("event-time eviction drops dormant users; a late straggler cannot resurrect them") {
    import spark.implicits._
    val us = 1000000L
    val day = 86400L * us
    val t0 = 1704067200L * us
    // A converts immediately; B stalls at view; C is the clock that
    // advances the watermark ~100 days, past A/B's 10-day horizon
    val b0 = Seq((1L, t0, "view"), (1L, t0 + 3600 * us, "click"),
      (1L, t0 + 7200 * us, "purchase"), (2L, t0, "view"))
    val b1 = Seq((3L, t0 + 100 * day, "view"))
    val b2 = Seq((3L, t0 + 100 * day + 3600 * us, "click"))
    // a straggler for evicted B, far below the watermark: must be
    // dropped BEFORE the operator — never resurrecting the state row
    val b3 = Seq((2L, t0 + day, "click"))
    // B RETURNS above the watermark: a fresh funnel generation whose
    // (last_us, rev) key must supersede the evicted final snapshot
    val b4 = Seq((2L, t0 + 101 * day, "view"))
    val dir = java.nio.file.Files.createTempDirectory("funnel-evict").toString
    Seq(b0, b1, b2, b3, b4).zipWithIndex.foreach { case (b, i) =>
      b.toDF("user_id", "tu", "event_type")
        .withColumn("ts", timestamp_micros(col("tu")).cast("timestamp_ntz"))
        .select("user_id", "ts", "event_type")
        .coalesce(1).write.parquet(s"$dir/b$i")
      Thread.sleep(1100) // distinct mtimes -> deterministic drain order
    }
    val schema = spark.read.parquet(s"$dir/b0").schema
    val q = Funnel.track(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$dir/*"),
      windowUs, "2 days", evictAfterUs = Some(10 * day))
      .writeStream.format("memory").queryName("funnel_evict")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("funnel-evict-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)

    val stateRows = q.recentProgress.reverse
      .flatMap(p => p.stateOperators.headOption)
      .headOption.map(_.numRowsTotal).getOrElse(-1L)
    assert(stateRows === 2L,
      s"state = C plus returning-B only (A and old-B evicted), got $stateRows rows")

    val rows = spark.table("funnel_evict").collect()
    def lastRow(uid: Long) = rows.filter(_.getLong(0) == uid)
      .maxBy(r => (r.getAs[Long]("last_us"), r.getAs[Long]("rev")))
    // A's final (timeout-sealed) snapshot keeps the completed funnel
    val a = lastRow(1L)
    assert(a.getAs[Boolean]("converted") && !a.isNullAt(3))
    // the dropped straggler never set a t2 in ANY of B's snapshots
    assert(rows.filter(_.getLong(0) == 2L).forall(_.isNullAt(2)))
    // the returning user's FRESH generation wins under the documented
    // (last_us, rev) key despite its smaller rev — the evicted final
    // snapshot (old t1, rev 1) must not shadow it
    val b = lastRow(2L)
    assert(b.getLong(1) === t0 + 101 * day,
      "the fresh funnel generation must supersede the evicted snapshot")
    assert(b.getAs[Long]("rev") === 1L)
  }

  test("state holds one row per user — never one per event") {
    import spark.implicits._
    val evs = eventRows
    val users = evs.map(_._1).distinct.size
    val dir = java.nio.file.Files.createTempDirectory("funnel-state").toString
    evs.toDF("user_id", "tu", "event_type")
      .withColumn("ts", timestamp_micros(col("tu")).cast("timestamp_ntz"))
      .select("user_id", "ts", "event_type")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val q = Funnel.track(
      spark.readStream.schema(schema).parquet(dir), windowUs, "2 days")
      .writeStream.format("memory").queryName("funnel_state")
      .outputMode("update")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("funnel-state-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    val stateRows = q.recentProgress.flatMap(p => Option(p.stateOperators))
      .flatten.map(_.numRowsTotal).maxOption.getOrElse(-1L)
    assert(stateRows === users.toLong,
      s"state must be keyed per user ($users), got $stateRows rows")
  }
}
