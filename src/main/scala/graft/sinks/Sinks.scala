package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Sinks (SURVEY.md §2.2). The reference's loads are BigQuery jobs; here
  * they are parquet-directory writes with the same delivery semantics.
  */
object Sinks {

  /** K1/K2 — append load (ref: config/bigquery/bigquery.py:273-309
    * WRITE_APPEND). */
  def append(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** K4 — parquet write with explicit compression
    * (ref: config/gcs/gcs.py:204-229). */
  def parquet(df: DataFrame, path: String, codec: String = "snappy"): Unit =
    df.write.mode("overwrite").option("compression", codec).parquet(path)

  /** Atomic snapshot swap for the upsert sink: write `<path>__tmp`, then
    * rename over the live dir. The staging-table + MERGE + TRUNCATE dance
    * (bigquery.py:206-271) becomes write-then-rename; readers see either
    * the old snapshot or the new one, never a half write (SURVEY.md §7.4.1).
    */
  def snapshotSwap(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(path + "__tmp")
    val live = new Path(path)
    val old = new Path(path + "__old")
    df.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(tmp, live)
    fs.delete(old, true)
  }

  /** K5 — sample dump (ref: mautic_hubspot_email_read_activities.py:198
    * `head(5).to_csv`). */
  def csvSample(df: DataFrame, path: String, n: Int = 5): Unit =
    df.limit(n).coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** K6 — reverse-ETL sink interface: the reference POSTs row-by-row to
    * HubSpot (ref: config/hubspot/hubspotoop.py:41-47,436-442, driven at
    * mautic_hubspot_email_read_activities.py:126-164). Distributed
    * equivalent: per-partition batched delivery via foreachPartition —
    * one client per partition, never a driver-side loop. */
  trait RowWriter extends Serializable {
    def open(): Unit = ()
    def write(row: Row): Unit
    def close(): Unit = ()
  }

  def foreachRowSink(df: DataFrame, writer: RowWriter): Unit =
    df.foreachPartition { it: Iterator[Row] =>
      writer.open()
      try it.foreach(writer.write)
      finally writer.close()
    }
}
