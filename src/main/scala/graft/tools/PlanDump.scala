package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkEntry
import graft.core.GraftSession

/** Dump `.explain("formatted")` for registered queries to files — the
  * optimization rounds' plan-evidence artifact (`plans/rNN/<q>_<tag>.txt`).
  * Offline tooling like QTime/ScaleSanity; not part of Verify/Bench. Run:
  *
  *   runMain graft.tools.PlanDump /root/testdata/sf0.1 plans/r17 before q144 q129
  *
  * (no query names = every registered query). NOTE: building a fold-shaped
  * query's frame RUNS its folds (the returned frame is the report over the
  * folded state), so the dumped plan is the final consumed frame's — the
  * same plan the bench's action executes last.
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.drop(1).headOption.getOrElse("plans/r17")
    val tag = args.drop(2).headOption.getOrElse("before")
    val names = args.drop(3).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    Files.createDirectories(Paths.get(outDir))
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = if (names.isEmpty) all
      else all.filter { case (n, _) => names.exists(n.startsWith) }
    picked.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        Files.write(Paths.get(outDir, s"${name}_$tag.txt"),
          plan.getBytes(StandardCharsets.UTF_8))
        println(s"[plandump] wrote $outDir/${name}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
