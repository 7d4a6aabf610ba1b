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

  /** Hidden-dir prefix for a partition's superseded version during a swap.
    * Dot-prefixed names are invisible to Spark's file listing, so readers
    * never see a retired partition as data. */
  private val OldPartPrefix = ".graft-old-"

  /** Crash-consistent publish of staged partition directories into a live
    * partitioned snapshot — the commit protocol of the partition-scoped
    * MERGE (ref: the atomic warehouse MERGE at
    * config/bigquery/bigquery.py:259-262, which BigQuery commits
    * transactionally; plain parquet gets the same guarantee from per-dir
    * renames).
    *
    * For each `col=value` directory under `stagedPath`, in sorted order:
    * retire the live partition dir to a hidden `.graft-old-` name
    * (atomic rename), promote the staged dir into its place (atomic
    * rename), then drop the retired copy. Each partition is therefore
    * always either its complete old version or its complete new version —
    * a crash can never leave a partition with a mix of old and new files,
    * which is the failure mode of dynamic partition overwrite's
    * delete-then-commit window. A crash between the two renames leaves
    * that one partition retired-but-not-promoted; `recoverPartitionSwaps`
    * restores it from the hidden dir on the next run, and the staged data
    * (never deleted on failure) plus the un-advanced cursor make the batch
    * replayable.
    *
    * `beforeEach` is a test seam: invoked with the partition dir name
    * before its swap starts (used by the crash-simulation specs).
    */
  def swapPartitions(spark: SparkSession, stagedPath: String, livePath: String,
                     beforeEach: String => Unit = _ => ()): Unit = {
    val live = new Path(livePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(live)
    val parts = fs.listStatus(new Path(stagedPath))
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName)
    parts.foreach { staged =>
      val name = staged.getName
      beforeEach(name)
      val target = new Path(live, name)
      val old = new Path(live, OldPartPrefix + name)
      if (fs.exists(old)) fs.delete(old, true) // stale retiree from a crash-after-promote
      if (fs.exists(target)) fs.rename(target, old)
      fs.rename(staged, target)
      fs.delete(old, true)
    }
    fs.delete(new Path(stagedPath), true)
  }

  /** Repair pass for `swapPartitions` interrupted mid-swap: a hidden
    * `.graft-old-` dir with no live counterpart means the crash hit
    * between retire and promote — restore the old version (the new data
    * is still in the staged dir and the batch replays); with a live
    * counterpart the swap completed and the retiree is garbage.
    * @return the partition names restored from their hidden old version */
  def recoverPartitionSwaps(spark: SparkSession, livePath: String): Seq[String] = {
    val live = new Path(livePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live)) Seq.empty
    else fs.listStatus(live)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(OldPartPrefix))
      .toSeq.flatMap { st =>
        val name = st.getPath.getName.stripPrefix(OldPartPrefix)
        val target = new Path(live, name)
        if (fs.exists(target)) { fs.delete(st.getPath, true); Seq.empty }
        else { fs.rename(st.getPath, target); Seq(name) }
      }
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
