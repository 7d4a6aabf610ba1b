package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Eager materialization for intermediate frames that downstream plans
  * self-join (LSH signature tables, bucketed embeddings, IVF cell
  * assignments): compute once, then hand every consumer a scan of the
  * materialized result instead of re-running the producing aggregation
  * per branch.
  *
  * Two modes, selected by `spark.graft.staging`:
  *
  *  - `local` (default): `localCheckpoint(eager = true)` — blocks live in
  *    executor storage and are reclaimed by the ContextCleaner when the
  *    frame goes out of scope. Fast (no filesystem round-trip), but the
  *    lineage is truncated into executor-LOCAL blocks: on a real cluster,
  *    losing one executor after the checkpoint kills the query with no
  *    recompute path. Right for local runs and for clusters with
  *    shuffle/storage decommissioning.
  *  - `reliable`: an explicit parquet staging write under
  *    `spark.graft.staging.dir`, read back as a fresh source. Survives
  *    executor loss (any task can re-read the staged files), at the cost
  *    of one filesystem round-trip — the same staging-table discipline
  *    the reference applies before its MERGE
  *    (ref: config/bigquery/bigquery.py:206-271). Staged directories are
  *    run-scoped scratch: every path written is tracked per session and
  *    `reclaim(spark)` deletes them at run end. An orchestrator that owns
  *    the scratch location instead (a per-run dir it clears itself, like
  *    any shuffle/scratch location) sets
  *    `spark.graft.staging.owner=orchestrator`, which turns `reclaim`
  *    into a no-op.
  *
  * Both modes also cut the logical plan at the staged frame, which keeps
  * deeply self-referencing join trees (signature ⋈ signature) out of the
  * optimizer and — for sinks — drops the staged path from the write
  * plan's input set, so a stage-then-overwrite of the same snapshot
  * directory is legal.
  */
object Staging {

  // staged paths per session, for run-end reclamation; sessions held
  // weakly so a stopped session doesn't pin its entries
  private val stagedPaths = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.List[String]]())

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get("spark.graft.staging", "local") == "reliable") {
      val base = spark.conf.get("spark.graft.staging.dir",
        sys.props("java.io.tmpdir") + "/graft-staging")
      val path = s"$base/stage-${java.util.UUID.randomUUID()}"
      df.write.mode("error").parquet(path)
      stagedPaths
        .computeIfAbsent(spark, _ => java.util.Collections.synchronizedList(
          new java.util.ArrayList[String]()))
        .add(path)
      spark.read.parquet(path)
    } else df.localCheckpoint(eager = true)
  }

  /** Delete every staging directory this session wrote, at run end — the
    * missing half of the `reliable` mode's lifecycle (staged dirs are
    * scratch; a long-lived session that never reclaims them leaks one
    * parquet copy per staged frame). Only call once the run's actions are
    * complete: a staged frame still awaiting consumption reads from its
    * staged path. No-op (returns 0, keeps the dirs) when
    * `spark.graft.staging.owner=orchestrator` — the documented mode where
    * the orchestrator points `spark.graft.staging.dir` at a per-run
    * location and clears it itself.
    * @return number of staging directories deleted */
  def reclaim(spark: SparkSession): Int = {
    if (spark.conf.get("spark.graft.staging.owner", "run") == "orchestrator") 0
    else {
      val tracked = stagedPaths.remove(spark)
      if (tracked == null) 0
      else {
        var n = 0
        tracked.forEach { p =>
          val hp = new Path(p)
          val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (fs.delete(hp, true)) n += 1
        }
        n
      }
    }
  }
}
