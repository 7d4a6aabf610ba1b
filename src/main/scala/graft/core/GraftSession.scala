package graft.core

import org.apache.spark.sql.SparkSession

/** Canonical session factory for every engine-owned entrypoint (Bench,
  * Verify, Smoke, tests). Session-level configuration lives HERE, once,
  * instead of being mutated from per-query code paths:
  *
  *  - `spark.sql.legacy.parquet.nanosAsLong`: the driver's `events` table
  *    is INT64 TIMESTAMP(NANOS) parquet, which Spark 4 otherwise rejects
  *    (PARQUET_TYPE_ILLEGAL). Reading nanos as long and flooring to
  *    micros in [[Tables.load]] matches Spark's own ns→µs truncation.
  *  - UTC session timezone: the reference pins all timestamps to UTC and
  *    shifts to GMT+7 only at the reporting edge (SURVEY.md §1.2).
  *  - shuffle partitions sized to the core count — local[32] stands in
  *    for a multi-executor cluster; at 100 TB this knob (or AQE coalesce)
  *    is sized to executors × cores instead.
  *
  * Externally-owned sessions (the driver's smoke harness calls
  * `SparkEntry.entry(spark)` with its own session) are documented there;
  * [[Tables.load]] keeps a guarded fallback for the nanos conf so an
  * external session can still read `events`.
  */
object GraftSession {

  /** Fastest local scratch for EPHEMERAL bytes (shuffle files, spill,
    * scratch state): the RAM-backed dir when the box has one AND it has
    * real headroom, else the JVM default (disk). Shuffle data is
    * transient by definition — Spark's own tuning guide says to point
    * `spark.local.dir` at the fastest local storage — and nothing
    * durable ever lives here: state PUBLISHES go where the caller
    * points them.
    *
    * The tmpfs is GATED, not unconditional: /dev/shm is typically capped
    * at 50% of RAM and shares physical pages with the executor heap, so
    * a shuffle-heavy run that would have spilled to disk can instead die
    * with ENOSPC (or push the box into reclaim). The RAM path is taken
    * only when the tmpfs currently has ≥ [[shmMinUsableBytes]] usable —
    * sized at several times the engine's worst observed per-run scratch
    * high-water mark (sf0.1 bench ≈ low single-digit GiB) — so a box
    * where /dev/shm is small or already crowded falls back to disk.
    * `GRAFT_SCRATCH_DIR` overrides the choice entirely (either
    * direction) for deployments that know better. */
  private val shmMinUsableBytes = 24L << 30

  def fastScratch: String = sys.env.get("GRAFT_SCRATCH_DIR").getOrElse {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val usable = scala.util.Try(
      java.nio.file.Files.getFileStore(shm).getUsableSpace).getOrElse(0L)
    if (java.nio.file.Files.isDirectory(shm) &&
        java.nio.file.Files.isWritable(shm) &&
        usable >= shmMinUsableBytes) shm.toString
    else sys.props("java.io.tmpdir")
  }

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.local.dir", s"$fastScratch/graft-local")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // native expressions (rolling_fingerprint, vector_dot) available in
      // every session without per-query registration
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // managed tables (bucketed writes) go to a per-JVM scratch dir, not
      // ./spark-warehouse in the repo
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      // v2 commit: task outputs move to the destination at task commit
      // instead of a second job-commit rename pass. The engine's state
      // writes do not rely on committer atomicity — snapshot publishes go
      // through the rename/marker swap (Sinks.snapshotSwap/
      // snapshotPublish) and bucketed appends are novelty-guarded and
      // replay-absorbing (StateStore) — so the stricter v1 protocol buys
      // nothing here while costing a rename per file per write, and the
      // per-fold state writes are exactly where the bench pays it.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")

  def local(cores: Int): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    quietBoundedWindowWarnings()
    quietReleasedCheckpointWarnings()
    s
  }

  /** Silence WindowExec's "No Partition Defined" warning. Every
    * unpartitioned window in the engine runs over a BOUNDED frame by
    * construction (k-row seed numbering in Kmeans/Pq after a limit(k),
    * GlobalRank's per-partition summaries — one row per input
    * partition), so the warning is pure noise here — and noise that
    * could mask a REAL accidentally-global window in a 600-line bench
    * tail. A constant partition key doesn't work (the optimizer folds
    * literal partition expressions away before the check), so the
    * logger itself is pinned to ERROR. PlanSpec remains the guard that
    * actual data windows stay keyed. */
  private def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)

  /** Silence the "was locally checkpointed ... cannot be recomputed
    * after unpersisting" WARN that every Staging.release emits: the
    * unrecoverability is exactly the caller's documented assertion
    * (the frame is dead), and the streaming folds release 3–4 frames
    * per micro-batch — enough to drown a bench log in noise that could
    * mask a real warning. Pinned per RDD class that carries the
    * checkpoint (the message logs under the concrete RDD's logger). */
  private def quietReleasedCheckpointWarnings(): Unit =
    Seq("org.apache.spark.rdd.MapPartitionsRDD",
        "org.apache.spark.sql.execution.SQLExecutionRDD")
      .foreach(l => org.apache.logging.log4j.core.config.Configurator
        .setLevel(l, org.apache.logging.log4j.Level.ERROR))
}
