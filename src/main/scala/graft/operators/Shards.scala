package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-shard export — the TERMINAL stage of the corpus pipeline:
  * the prepared corpus ships as size-balanced, reproducibly-ordered
  * shard files a training loader streams sequentially. Requirements at
  * 100 TB, and how each is met:
  *
  *  - deterministic global order (re-export produces byte-identical
  *    shards): rows rank under a caller-supplied TOTAL order — usually
  *    the q89 seeded-hash shuffle order — via [[GlobalRank]], never a
  *    single-partition window;
  *  - exact shard sizes (loaders schedule by shard, stragglers cost
  *    wall-clock): shard id = (rank - 1) / rowsPerShard, so every shard
  *    except the last holds exactly `rowsPerShard` rows;
  *  - one FILE per shard (the loader contract), without funneling the
  *    corpus through few tasks: repartitioning BY the shard id makes
  *    every partition shard-complete — all rows of a shard land in one
  *    task, so `partitionBy("shard")` emits exactly one file per shard
  *    directory; hash collisions between shard ids only mean one task
  *    writes two complete shards (transient 2x skew, never a wrong
  *    file count) while the corpus stays spread across numShards tasks;
  *  - rank order preserved INSIDE each shard file
  *    (`sortWithinPartitions` before the write — parquet preserves row
  *    order, so a sequential read replays the global order).
  */
object Shards {

  /** Write `df` as exact-size training shards under `path`
    * (`shard=K/part-*.parquet`, one file per shard).
    * @param order a total (tie-free) ordering column, e.g. the seeded
    *              hash of q89's corpus shuffle
    * @return the shard count */
  def write(df: DataFrame, path: String, rowsPerShard: Long, order: Column): Long = {
    require(rowsPerShard > 0, s"rowsPerShard must be positive: $rowsPerShard")
    val ranked = GlobalRank.withRank(df, order, out = "graft_rank")
      .withColumn("shard", ((col("graft_rank") - 1) / rowsPerShard).cast("long"))
    val staged = graft.core.Staging.stage(ranked)
    val numShards = staged.agg(max(col("shard"))).collect()(0).getLong(0) + 1
    staged
      .repartition(numShards.toInt, col("shard"))
      .sortWithinPartitions(col("shard"), col("graft_rank"))
      .write.partitionBy("shard").mode("overwrite").parquet(path)
    numShards
  }

  /** Read shards back in global order (shard asc, in-file order). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).orderBy(col("shard"), col("graft_rank"))
}
