package graft.pipelines

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.cursor.CursorStore
import graft.lineage.{Lineage, RunTelemetry}
import graft.operators.{Dedup, Upsert}

/** The reference's canonical snapshot-sync lifecycle (SURVEY.md §3.1,
  * ref: pipeline/hubspot_2_bigquery_migration/companies_pipeline.py:96-139):
  *
  *   read cursor → extract rows modified after it (predicate pushed into
  *   the scan) → dedup by pk → stamp lineage → MERGE upsert into the
  *   snapshot → advance cursor.
  *
  * `orders` stands in for the object table (pk o_orderkey, cursor
  * o_orderdate) per FIXTURES.md §2. State (cursor table, snapshot) lives
  * in a temp dir — the driver smoke only checks the returned frame.
  */
object SnapshotSync {

  def run(spark: SparkSession, dir: String): DataFrame = {
    val tmp = Files.createTempDirectory("graft-sync").toString
    val runId = Lineage.newRunId()
    val batchTs = Timestamp.valueOf("2002-01-01 00:00:00")
    // run telemetry, mirroring the reference's workflow_monitoring
    // (functions.py:26-40): every materializing action below is captured
    // with rows + elapsed and reported at end of run; detached in the
    // finally so a failed run can't leak the listener onto the
    // long-lived session
    val telemetry = RunTelemetry.attach(spark, runId)
    try {

    val cursorStore = new CursorStore(spark, s"$tmp/cursor")
    val orders = Tables.load(spark, dir, "orders")

    // Bootstrap: snapshot holds everything before the initial cursor.
    val initialCursor = Timestamp.valueOf("1999-01-01 00:00:00")
    val target = orders
      .filter(col("o_orderdate") < lit(initialCursor))
      .transform(Lineage.stamp("bootstrap", Timestamp.valueOf("1999-01-01 00:00:00")))
    cursorStore.advance("orders", initialCursor, "bootstrap", batchTs)

    // Incremental run: extract strictly-after-cursor (filter pushed to the
    // parquet scan), dedup deterministically, stamp, upsert.
    val cursor = cursorStore.latest("orders").getOrElse(initialCursor)
    val changed = orders
      .filter(col("o_orderdate") >= lit(cursor))
      .transform(df => Dedup.latestWins(df, Seq("o_orderkey"), "o_orderdate"))
      .transform(Lineage.stamp(runId, batchTs))

    val merged = Upsert(target, changed, Seq("o_orderkey"), "o_orderdate")

    // Materialize the post-MERGE snapshot before the second pass — the
    // reference also goes through a staging table between load and MERGE
    // (bigquery.py:206-271); this also keeps the second upsert's plan
    // independent of the first (deeply self-referencing join/union trees
    // trip Spark's zipped-partition reuse).
    graft.sinks.Sinks.snapshotSwap(merged, s"$tmp/orders_snapshot")
    val liveSnapshot = spark.read.parquet(s"$tmp/orders_snapshot")

    // Second upsert pass for soft-deleted objects, mirroring the
    // reference's archived re-scan + upsert with `archived` as the change
    // detector (ref: companies_pipeline.py:113-124): finished orders play
    // the archived partition; their tombstone lands as a flag update.
    val withFlag = liveSnapshot.withColumn("archived", lit(false))
    val archived = orders
      .filter(col("o_orderstatus") === "F")
      .transform(Lineage.stamp(runId, batchTs))
      .withColumn("archived", lit(true))
      // cursor bump so the MERGE cursor-change guard applies the tombstone
      .withColumn("o_orderdate", col("o_orderdate") + expr("INTERVAL 1 SECOND"))
    val finalSnapshot = Upsert(withFlag, archived, Seq("o_orderkey"), "o_orderdate")

    cursorStore.advance("orders", batchTs, runId, batchTs)

    // end-of-run report (the reference posts this to chat; here it goes
    // to the run log — delivery to an external channel is the
    // reverse-ETL sink seam)
    telemetry.awaitQuiesce()
    telemetry.summaryLines.foreach(l => println(s"[run-report] $l"))
    finalSnapshot
    } finally telemetry.detach()
  }
}
