package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The bucketed-state probe discipline, in ONE place: streaming state
  * tables (content hashes, band indexes, token sets, activity pairs)
  * are partitioned by a stable hash bucket of their probe key so a
  * micro-batch reads only the buckets its delta touches, and the probes
  * broadcast the (bounded) delta so no accumulated-state row is ever
  * shuffled. CorpusStream, ClusterMaintenance, and EventReports all
  * fold through these helpers — the per-batch-∝-delta claim is
  * maintained here, measured in ShuffleGrowthSpec.
  */
object StateStore {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** Does `path` hold the bucketed (partition-dir) layout? One listing,
    * not a schema inference — this runs on every fold. */
  def isBucketed(spark: SparkSession, path: String, bucketCol: String): Boolean = {
    val p = new Path(path)
    val f = fs(spark, path)
    f.exists(p) && f.listStatus(p)
      .exists(_.getPath.getName.startsWith(bucketCol + "="))
  }

  /** One-time layout migration: state written by a pre-bucketing engine
    * version has no bucket column — derive it and rewrite through the
    * atomic snapshot swap (∝ state, once) so the first post-upgrade
    * fold finds the layout it probes. Also re-buckets state written
    * under a LARGER bucket count (`buckets` > 0): a dir value ≥ the
    * current modulus proves a stale modulus, and since bucket-count
    * changes in this engine are power-of-two halvings/doublings, values
    * BELOW the modulus are already consistent (hash mod 2k in [0, k)
    * equals hash mod k) — a non-divisor change requires an explicit
    * rewrite, which is exactly what this triggers. No-op (one directory
    * listing) when the layout and modulus already match. */
  def ensureBucketed(spark: SparkSession, path: String, bucketCol: String,
                     bucketOf: Column, buckets: Int = 0): Unit =
    if (exists(spark, path)) {
      val staleModulus = buckets > 0 && isBucketed(spark, path, bucketCol) &&
        fs(spark, path).listStatus(new Path(path)).exists { st =>
          val n = st.getPath.getName
          n.startsWith(bucketCol + "=") &&
            scala.util.Try(n.stripPrefix(bucketCol + "=").toInt)
              .toOption.exists(_ >= buckets)
        }
      if (staleModulus)
        graft.sinks.Sinks.snapshotSwap(
          spark.read.parquet(path).drop(bucketCol)
            .withColumn(bucketCol, bucketOf)
            .repartition(col(bucketCol)),
          path, Seq(bucketCol))
      else if (!isBucketed(spark, path, bucketCol))
        graft.sinks.Sinks.snapshotSwap(
          spark.read.parquet(path).withColumn(bucketCol, bucketOf)
            .repartition(col(bucketCol)),
          path, Seq(bucketCol))
    }

  /** The state slice a delta's probe touches: partition-pruned by the
    * delta's distinct bucket values (a bounded collect — at most the
    * bucket-count, the `Upsert.partitioned` touched-partition category).
    * The returned frame is meant to be SCANNED against a broadcast of
    * the delta, never shuffled.
    *
    * @param deltaRows the delta's row count when the caller already has
    *   it: a delta with many times more rows than there are buckets has
    *   touched every bucket with near-certainty, so the pruning collect
    *   is a wasted job — read the table whole (same bytes either way). */
  def prunedByTouched(spark: SparkSession, path: String, bucketCol: String,
                      delta: DataFrame, deltaBucket: Column,
                      buckets: Int = 0, deltaRows: Long = -1L): DataFrame = {
    if (buckets > 0 && deltaRows >= buckets.toLong * 16)
      spark.read.parquet(path)
    else {
      val touched = delta.select(deltaBucket.as("__b")).distinct()
        .collect().map(_.get(0)).toIndexedSeq
      spark.read.parquet(path).filter(col(bucketCol).isin(touched: _*))
    }
  }

  /** Delta rows whose `keys` are NOT yet in the bucketed state table —
    * the novelty probe shared by the exact-dedup hash store and the
    * activity-pair store. The pruned state is inner-joined against a
    * broadcast of the delta's keys, producing the already-seen subset
    * (≤ delta-sized); the anti-join then runs delta-vs-seen. Shuffle is
    * delta-sized regardless of accumulated state. `delta` must carry
    * the key columns under the state's names. */
  def novelAgainst(path: String, delta: DataFrame, keys: Seq[String],
                   bucketCol: String, deltaBucket: Column,
                   buckets: Int = 0, deltaRows: Long = -1L): DataFrame = {
    val spark = delta.sparkSession
    if (!exists(spark, path)) delta
    else {
      val state = prunedByTouched(spark, path, bucketCol, delta, deltaBucket,
        buckets, deltaRows)
      val seen = state
        .join(broadcast(delta.select(keys.map(col): _*)), keys)
        .select(keys.map(col): _*).distinct()
      delta.join(broadcast(seen), keys, "left_anti")
    }
  }
}
