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

  /** K1 variant — schema-enforced append. The reference's append load
    * takes a declared schema and marks every field REQUIRED
    * (ref: config/bigquery/bigquery.py:279-283); this is the Spark
    * equivalent plus SURVEY §1.2's cast-at-the-edge staging mode:
    * every declared column is cast to its declared type, a null in a
    * non-nullable field fails the write via a distributed `raise_error`
    * (no extra validation pass over the data), and undeclared columns
    * are dropped — the declared schema is the contract.
    */
  def appendWithSchema(df: DataFrame, schema: org.apache.spark.sql.types.StructType,
                       path: String): Unit = {
    import org.apache.spark.sql.functions._
    val projected = schema.fields.toIndexedSeq.map { f =>
      val c = col(f.name).cast(f.dataType)
      if (f.nullable) c.as(f.name)
      else when(c.isNull, raise_error(lit(s"NULL in REQUIRED field '${f.name}'")))
        .otherwise(c).as(f.name)
    }
    df.select(projected: _*).write.mode("append").parquet(path)
  }

  /** K4 — parquet write with explicit compression
    * (ref: config/gcs/gcs.py:204-229). */
  def parquet(df: DataFrame, path: String, codec: String = "snappy"): Unit =
    df.write.mode("overwrite").option("compression", codec).parquet(path)

  /** ORC write — columnar interchange with Hive-side consumers; same
    * compression option surface as the parquet sink. */
  def orc(df: DataFrame, path: String, codec: String = "zlib"): Unit =
    df.write.mode("overwrite").option("compression", codec).orc(path)

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

  /** Dynamic partition overwrite — the incremental variant of the
    * reference's year-partitioned rewrite (ref: config/gcs/gcs.py:143-187
    * rewrites `{object}/{taxcode}/{year}` files per run): only the
    * partitions PRESENT in `df` are replaced; all other partitions are
    * untouched. At 100 TB this is the difference between rewriting one
    * day's partition and rewriting the table; combined with the upsert
    * it gives partition-granular idempotent reloads.
    */
  def overwritePartitions(df: DataFrame, path: String, partCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Bucketed table write (SURVEY §4 / build brief: "bucketing for
    * co-located joins"). Two tables bucketed (and sorted) on the same
    * join key with the same bucket count join WITHOUT a shuffle — at
    * 100 TB, pre-bucketing the fact tables on their pk turns every
    * snapshot/MERGE/edge join into a local zip per bucket instead of a
    * full exchange of both sides. Bucketing metadata lives in the
    * catalog, hence `saveAsTable` rather than a path write.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.drop(1): _*)
      .sortBy(keys.head, keys.drop(1): _*)
      .format("parquet")
      .saveAsTable(table)

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
