package graft.core

import org.apache.spark.sql.DataFrame

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
  *    run-scoped scratch: point the dir at a per-run path and let the
  *    orchestrator clear it, like any shuffle/scratch location.
  *
  * Both modes also cut the logical plan at the staged frame, which keeps
  * deeply self-referencing join trees (signature ⋈ signature) out of the
  * optimizer and — for sinks — drops the staged path from the write
  * plan's input set, so a stage-then-overwrite of the same snapshot
  * directory is legal.
  */
object Staging {

  def stage(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get("spark.graft.staging", "local") == "reliable") {
      val base = spark.conf.get("spark.graft.staging.dir",
        sys.props("java.io.tmpdir") + "/graft-staging")
      val path = s"$base/stage-${java.util.UUID.randomUUID()}"
      df.write.mode("error").parquet(path)
      spark.read.parquet(path)
    } else df.localCheckpoint(eager = true)
  }
}
