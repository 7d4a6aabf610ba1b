package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

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
      // one partition per pass: the scan is partition-pruned to the dir
      // being rewritten, so compaction cost tracks the small partitions
      // it fixes, never the table
      val Array(partCol, partVal) = dirName.split("=", 2)
      spark.read.parquet(snapshotPath)
        .filter(col(partCol) === partVal)
        .repartition(nOut)
        .write.partitionBy(partCol).mode("error").parquet(stagedPath)
      Sinks.swapPartitions(spark, stagedPath, snapshotPath)
      dirName
    }.toSeq
  }
}
