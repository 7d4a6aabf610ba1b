package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global rank under a total order WITHOUT a single-partition
  * window — the operator behind a reproducible corpus shuffle ("order the
  * corpus by a seeded hash, then read it back in rank order"), where the
  * naive `row_number() OVER (ORDER BY h)` collapses the whole corpus
  * into one task (Spark warns "No Partition Defined for Window
  * operation" and at 100 TB the job simply dies).
  *
  * The scalable shape is the classic two-pass rank:
  *
  *  1. range-partition and sort by the order key — Spark's distributed
  *     sort (sampled boundaries, every partition holds a contiguous key
  *     range, partition ids ascend with the ranges);
  *  2. count rows per partition — the sorted frame is STAGED
  *     (graft.core.Staging) so this is a scan of the materialized
  *     blocks, not a second sort of the corpus (unstaged, Catalyst
  *     plans the count branch as its own scan + range sort of the order
  *     key); the one-row-per-partition counts cumulate into offsets by
  *     a window over that collapsed frame (the same bounded
  *     single-partition window every collapsed aggregate in this engine
  *     uses — it runs over partition-count rows, never data rows);
  *  3. rank = partition offset + intra-partition row_number, a window
  *     PARTITIONED by the range-partition id — per-task state is one
  *     counter; the offset join is a broadcast of the tiny offset
  *     table, and the window's requirement costs one keyed exchange on
  *     the partition id (rows stay spread across the cluster — the
  *     point is that NOTHING here ever collapses to a single task).
  *
  * Ranks are deterministic — they depend only on the total order, not on
  * the sampled range boundaries (boundaries move rows between
  * partitions, but offset + local position always reconstructs the same
  * global position). The ORDER must be total (tie-free) for the rank to
  * be reproducible run-to-run; seeded-hash orders get that by including
  * a unique id in the hash input (q89's md5(doc_id || text)).
  */
object GlobalRank {

  /** The distributed order pass: range-partitioned, sorted within each
    * partition, every row stamped with its range-partition id (computed
    * HERE, before staging, so the id is frozen data downstream).
    * Exposed to PlanSpec: staging truncates lineage, so the
    * distributed-sort shape is only assertable on this sub-plan. */
  private[graft] def sortedWithPid(df: DataFrame, order: Column, n: Int): DataFrame =
    df.repartitionByRange(n, order.asc)
      .sortWithinPartitions(order.asc)
      .withColumn("graft_pid", spark_partition_id())

  /** `df` plus an `out` column holding the 1-based contiguous global
    * rank under `order` (ascending). `partitions` defaults to the
    * session's shuffle parallelism. */
  def withRank(
      df: DataFrame,
      order: Column,
      out: String = "rank",
      partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // staged: the counts branch and the rank join both re-scan the
    // materialized sorted blocks instead of re-sorting the corpus
    val sorted = graft.core.Staging.stage(sortedWithPid(df, order, n))
    // one row per range partition; the cumulative window runs over that
    // collapsed frame only (n rows), never over data rows
    val offsets = sorted.groupBy("graft_pid").agg(count(lit(1)).as("graft_n"))
      .withColumn("graft_off",
        coalesce(
          sum(col("graft_n")).over(
            Window.orderBy("graft_pid")
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("graft_pid", "graft_off")
    val local = Window.partitionBy("graft_pid").orderBy(order.asc)
    sorted
      .join(broadcast(offsets), Seq("graft_pid"))
      .withColumn(out, col("graft_off") + row_number().over(local).cast("long"))
      .drop("graft_pid", "graft_off")
  }
}
