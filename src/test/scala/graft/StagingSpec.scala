package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.LogicalRDD
import graft.core.Staging

/** graft.core.Staging — the two staging modes must produce identical
  * results, and the reliable mode must cut the plan at a re-readable
  * parquet source (the executor-loss recovery path).
  */
class StagingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def withStagingMode[A](mode: String)(body: => A): A = {
    val prev = spark.conf.getOption("spark.graft.staging")
    spark.conf.set("spark.graft.staging", mode)
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.graft.staging", v)
      case None => spark.conf.unset("spark.graft.staging")
    }
  }

  test("local mode stages via localCheckpoint (LogicalRDD plan cut)") {
    val staged = withStagingMode("local") {
      Staging.stage(spark.range(100).toDF("id"))
    }
    assert(staged.queryExecution.analyzed.isInstanceOf[LogicalRDD],
      "local staging must truncate lineage into checkpointed blocks")
    assert(staged.count() == 100)
  }

  test("reliable mode stages through a parquet round-trip") {
    val dir = Files.createTempDirectory("graft-staging-spec").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    val staged = withStagingMode("reliable") {
      Staging.stage(spark.range(100).toDF("id"))
    }
    try {
      // the staged frame is a fresh file source — any executor can re-read
      // it after a loss, unlike executor-local checkpoint blocks
      val p = staged.queryExecution.executedPlan.toString
      assert(p.contains("FileScan parquet") && p.contains("graft-staging-spec"),
        s"reliable staging must read back from the staging dir:\n$p")
      assert(staged.count() == 100)
    } finally spark.conf.unset("spark.graft.staging.dir")
  }

  test("reliable staging dirs are reclaimed at run end") {
    val dir = Files.createTempDirectory("graft-staging-reclaim").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    try {
      val staged = withStagingMode("reliable") {
        Staging.stage(spark.range(50).toDF("id"))
      }
      assert(staged.count() == 50)
      assert(new java.io.File(dir).listFiles().nonEmpty)
      // reclaim may also sweep dirs staged by earlier tests on this shared
      // session — at least this test's dir must go
      assert(Staging.reclaim(spark) >= 1)
      assert(new java.io.File(dir).listFiles().isEmpty,
        "run-end reclaim must empty the staging dir")
      assert(Staging.reclaim(spark) == 0, "second reclaim has nothing tracked")
    } finally spark.conf.unset("spark.graft.staging.dir")
  }

  test("scoped reclaim leaves dirs staged before the mark untouched") {
    val dir = Files.createTempDirectory("graft-staging-scope").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    try {
      withStagingMode("reliable") {
        // a caller's staged frame, created BEFORE the run's scope opens
        val callers = Staging.stage(spark.range(5).toDF("id"))
        val mark = Staging.mark(spark)
        Staging.stage(spark.range(7).toDF("id")).count() // the run's own scratch
        assert(Staging.reclaim(spark, mark) === 1,
          "scoped reclaim must delete only the run's own staging")
        // the caller's staged frame is still readable after the run ends
        assert(callers.count() === 5)
      }
    } finally {
      Staging.reclaim(spark)
      spark.conf.unset("spark.graft.staging.dir")
    }
  }

  test("orchestrator-owned staging is left untouched by reclaim") {
    val dir = Files.createTempDirectory("graft-staging-orch").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    spark.conf.set("spark.graft.staging.owner", "orchestrator")
    try {
      withStagingMode("reliable") {
        Staging.stage(spark.range(10).toDF("id")).count()
      }
      assert(Staging.reclaim(spark) == 0, "orchestrator-owned scratch is not the engine's to delete")
      assert(new java.io.File(dir).listFiles().nonEmpty,
        "staged dirs must survive reclaim under the orchestrator override")
    } finally {
      spark.conf.unset("spark.graft.staging.owner")
      spark.conf.unset("spark.graft.staging.dir")
    }
    // tracking persists through the no-op: once the engine owns the
    // lifecycle again, the same dirs are reclaimable
    assert(Staging.reclaim(spark) >= 1)
    assert(new java.io.File(dir).listFiles().isEmpty)
  }

  test("LSH pair queries are identical through both staging paths") {
    val dir = Files.createTempDirectory("graft-staging-spec2").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    try {
      // q73 exercises the iterative hash-min loop (one staging per
      // propagation round), q76 the two-index incremental join
      Seq("q46_minhash_pairs", "q51_simhash_pairs", "q53_ann_topk",
          "q73_dup_clusters", "q76_incremental_dedup").foreach { name =>
        val local = withStagingMode("local") {
          SparkEntry.queries(name)(spark, sf).collect().toSeq
        }
        val reliable = withStagingMode("reliable") {
          SparkEntry.queries(name)(spark, sf).collect().toSeq
        }
        assert(local == reliable, s"$name diverged between staging modes")
        assert(local.nonEmpty, s"$name returned no rows")
      }
    } finally spark.conf.unset("spark.graft.staging.dir")
  }
}
