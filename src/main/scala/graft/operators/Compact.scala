package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    * ⌈bytes / targetFileBytes⌉ files. Partitions are rewritten
    * `batchSize` at a time in ONE Spark job per batch: a heavily
    * fragmented snapshot (10⁵ touched partitions) costs ⌈N/batch⌉ jobs,
    * not N — one job per partition made per-job scheduling overhead the
    * compaction bottleneck long before the bytes did.
    * @return the partition dir names rewritten */
  def partitions(spark: SparkSession, snapshotPath: String,
                 targetFileBytes: Long = 128L << 20,
                 maxFilesPerPartition: Int = 4,
                 batchSize: Int = 16): Seq[String] = {
    val root = new Path(snapshotPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Sinks.recoverPartitionSwaps(spark, snapshotPath)
    // a crash mid-compaction orphans its __compact-<uuid> staged dir (the
    // live snapshot is repaired above, but nothing else references the
    // staging copy) — sweep them on entry, mirroring Upsert.partitioned's
    // __stage-* sweep, so repeated crashes don't leak partition copies
    fs.globStatus(new Path(s"${snapshotPath}__compact-*"))
      .foreach(st => fs.delete(st.getPath, true))

    // driver-side partition census: (dir name, data file paths, bytes)
    val candidates = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map { st =>
        val files = fs.listStatus(st.getPath)
          .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
        (st.getPath.getName, files.map(_.getPath).toSeq, files.map(_.getLen).sum)
      }
      .filter { case (_, files, _) => files.length > maxFilesPerPartition }

    // Schema handling, two layers. WITHIN a dir: incremental appends can
    // straddle a schema evolution inside ONE partition, and a
    // single-footer inferred schema would silently drop the newer files'
    // columns from the rewrite (data loss, since the originals are
    // swapped away). ACROSS dirs: a batch unions its partitions into one
    // frame, so dirs whose (merged) schemas differ must not share a
    // batch — group by schema; each partition is rewritten with exactly
    // its own merged layout, never another group's. Footers are read on
    // the DRIVER via parquet-hadoop (metadata-priced RPCs, the same
    // category as the directory listing above) and converted with
    // Spark's own parquet→Catalyst converter: a per-candidate
    // mergeSchema read would schedule one distributed schema-inference
    // JOB per fragmented partition, re-creating at census time the
    // per-partition job overhead the batched rewrite below exists to
    // avoid. Only a dir whose footers genuinely DISAGREE (straddling an
    // evolution — rare) pays the one mergeSchema job for Spark's exact
    // merge semantics. A census past ~10⁵ partitions should come from
    // write-side manifests (the touched-partition lists the MERGE
    // already records) rather than this listing+footer walk. Only the
    // SCHEMA is retained from this pass — batch reads below re-open
    // their dirs with the schema passed explicitly (the parquet reader
    // nulls a file's missing columns), so neither a second footer walk
    // nor 10⁵ live DataFrames/file indexes ever accumulate on the
    // driver.
    val hconf = spark.sparkContext.hadoopConfiguration
    // the SQLConf-based constructor — the bare-Configuration one expects
    // session-prepared keys (binaryAsString etc.) and throws on a raw
    // sparkContext hadoopConfiguration
    val toCatalyst =
      new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter(
        org.apache.spark.sql.internal.SQLConf.get)
    val bySchema = candidates
      .map { case (dirName, files, bytes) =>
        val footerTypes = files.map { p =>
          val in = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(p, hconf))
          try in.getFileMetaData.getSchema finally in.close()
        }.distinct
        val schema =
          if (footerTypes.lengthCompare(1) == 0) toCatalyst.convert(footerTypes.head)
          else spark.read.option("mergeSchema", true)
            .parquet(s"$snapshotPath/$dirName").schema
        (schema, (dirName, files.length, bytes))
      }
      .groupBy(_._1).toSeq

    bySchema.flatMap { case (schema, group) =>
      group.map(_._2).grouped(batchSize).map((schema, _))
    }.flatMap { case (schema, batch) =>
      def readDir(dirName: String) =
        spark.read.schema(schema).parquet(s"$snapshotPath/$dirName")
      val stagedPath = s"${snapshotPath}__compact-${java.util.UUID.randomUUID()}"
      // Read each partition DIRECTORY verbatim and restore the staged
      // output under the IDENTICAL dir name. An earlier
      // filter-on-decoded-value + partitionBy round-trip let Spark's
      // partition type inference re-canonicalize the value (y=01 read as
      // int 1 was rewritten as y=1 — swapPartitions then promoted a new
      // dir while the old one stayed live, duplicating rows on read) and
      // URL-escaped values (%XX) matched nothing, silently no-op'ing
      // while still being reported as rewritten (CompactSpec pins both).
      // So the batch write never round-trips the VALUE: each dir's rows
      // are tagged with a batch-local integer, the job partitions by the
      // tag, and the tag dirs are renamed back to the original dir names
      // (a metadata op) before the swap. The files' schema already
      // excludes the partition column (partitionBy writes drop it, and
      // the tag is dropped the same way), so rewritten files keep the
      // dir's own (merged) layout — identical to the originals unless
      // the dir itself straddles a schema evolution, in which case older
      // rows gain the newer columns as nulls rather than newer columns
      // being dropped.
      val nOut = batch.map { case (_, _, bytes) =>
        math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      }
      // Every (tag, salt) combination maps to its own GLOBAL slot
      // (offset(tag) + salt) and slots are placed 1:1 onto tasks by an
      // explicit partitioner, so each partition comes out in exactly
      // nOut(tag) files. A hash repartition on (tag, salt) cannot
      // promise that: colliding combos merge tasks, and partitionBy then
      // writes fewer, oversized files — which the file-count threshold
      // never re-selects, so the oversize would be permanent.
      val offsets = nOut.scanLeft(0)(_ + _)
      val saltFor = map(nOut.zipWithIndex.flatMap { case (n, i) =>
        Seq(lit(i), lit(n.toLong))
      }: _*)
      val slotBase = map(batch.indices.flatMap(i =>
        Seq(lit(i), lit(offsets(i).toLong))): _*)
      val tagged = batch.zipWithIndex.map { case ((dirName, _, _), i) =>
          readDir(dirName).withColumn("__graft_p", lit(i))
        }
        .reduce(_.unionByName(_))
        .withColumn("__graft_slot",
          (element_at(slotBase, col("__graft_p")) +
            pmod(monotonically_increasing_id(), element_at(saltFor, col("__graft_p"))))
            .cast("int"))
      val slotted = spark.createDataFrame(
        tagged.rdd.keyBy(_.getAs[Int]("__graft_slot"))
          .partitionBy(new org.apache.spark.Partitioner {
            override def numPartitions: Int = offsets.last
            override def getPartition(key: Any): Int = key.asInstanceOf[Int]
          })
          .map(_._2),
        tagged.schema)
      slotted.drop("__graft_slot")
        .write.partitionBy("__graft_p").mode("error").parquet(stagedPath)
      batch.zipWithIndex.foreach { case ((dirName, _, _), i) =>
        val staged = new Path(s"$stagedPath/__graft_p=$i")
        if (fs.exists(staged))
          Sinks.rename(fs, staged, new Path(s"$stagedPath/$dirName"))
        // A candidate whose files hold zero rows (metadata-only parquet
        // from empty-frame saves) legitimately emits no staged dir —
        // publish an empty dir so the swap still collapses its junk
        // files. But ONLY after re-proving the source is empty: a
        // missing dir for a partition that HAS rows means the write
        // lost them, and swapping an empty dir over the live copy would
        // convert that bug into silent data deletion. Fail loudly
        // instead — the staged batch is abandoned, the live snapshot
        // untouched. The probe is per-missing-tag (rare) and
        // LocalLimit-1 cheap.
        else if (readDir(dirName).isEmpty) fs.mkdirs(new Path(s"$stagedPath/$dirName"))
        else throw new java.io.IOException(
          s"compaction staged no output for non-empty partition $dirName")
      }
      // parquet() drops a _SUCCESS marker at the staged dir level; remove
      // it so swapPartitions sees only the partition dirs
      fs.delete(new Path(s"$stagedPath/_SUCCESS"), false)
      Sinks.swapPartitions(spark, stagedPath, snapshotPath)
      batch.map(_._1)
    }.toSeq
  }
}
