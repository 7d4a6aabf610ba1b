package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.sinks.Sinks

/** Small-file compaction for a partitioned snapshot (beyond-reference
  * breadth — the reference's warehouse compacts internally; a
  * parquet-directory snapshot accumulates one file per incremental batch
  * per partition until reads drown in per-file open costs).
  *
  * Incremental MERGE writes (Upsert.partitioned) add files to touched
  * partitions; after N batches a hot partition holds N small files, and
  * at 100 TB the scan's bottleneck becomes file-listing and footer reads
  * rather than bytes. Compaction rewrites each qualifying partition into
  * ⌈bytes / targetFileBytes⌉ files.
  *
  * Scale design: partition sizes come from a driver-side LISTING
  * (metadata, same category as the touched-partition read), selection
  * is threshold-based so an already-compact partition is never
  * rewritten, and the rewrite publishes through the same
  * crash-consistent per-partition staged swap as the MERGE
  * (`Sinks.swapPartitions` + `recoverPartitionSwaps` repair) — a crash
  * mid-compaction leaves every partition complete-old or complete-new,
  * and compaction is idempotent (re-running selects nothing once
  * partitions are compact).
  */
object Compact {

  /** Compact partitions of `snapshotPath` that hold more than
    * `maxFilesPerPartition` data files, rewriting each into
    * ⌈bytes / targetFileBytes⌉ files.
    * @return the partition dir names rewritten */
  def partitions(spark: SparkSession, snapshotPath: String,
                 targetFileBytes: Long = 128L << 20,
                 maxFilesPerPartition: Int = 4): Seq[String] = {
    val root = new Path(snapshotPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Sinks.recoverPartitionSwaps(spark, snapshotPath)
    // a crash mid-compaction orphans its __compact-<uuid> staged dir (the
    // live snapshot is repaired above, but nothing else references the
    // staging copy) — sweep them on entry, mirroring Upsert.partitioned's
    // __stage-* sweep, so repeated crashes don't leak partition copies
    fs.globStatus(new Path(s"${snapshotPath}__compact-*"))
      .foreach(st => fs.delete(st.getPath, true))

    // driver-side partition census: (dir name, #data files, bytes)
    val candidates = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map { st =>
        val files = fs.listStatus(st.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        (st.getPath.getName, files.length, files.map(_.getLen).sum)
      }
      .filter { case (_, nFiles, _) => nFiles > maxFilesPerPartition }

    candidates.map { case (dirName, _, bytes) =>
      val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val stagedPath = s"${snapshotPath}__compact-${java.util.UUID.randomUUID()}"
      // Read the one partition DIRECTORY and write the staged output under
      // the IDENTICAL dir name. The earlier filter-on-decoded-value +
      // partitionBy round-trip let Spark's partition type inference
      // re-canonicalize the value (y=01 read as int 1 is rewritten as
      // y=1 — swapPartitions then promotes a new dir while the old one
      // stays live, duplicating rows on read) and URL-escaped values
      // (%XX) matched nothing, silently no-op'ing while still being
      // reported as rewritten. Reading the dir as a plain parquet path
      // sidesteps decoding entirely: the files' schema already excludes
      // the partition column (partitionBy writes drop it), so the
      // rewritten files are layout-identical to the originals.
      spark.read.parquet(s"$snapshotPath/$dirName")
        .repartition(nOut)
        .write.mode("error").parquet(s"$stagedPath/$dirName")
      // parquet() drops a _SUCCESS marker at the staged dir level; remove
      // it so swapPartitions sees only the partition dir
      fs.delete(new Path(s"$stagedPath/$dirName/_SUCCESS"), false)
      Sinks.swapPartitions(spark, stagedPath, snapshotPath)
      dirName
    }.toSeq
  }
}
