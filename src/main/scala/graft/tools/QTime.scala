package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** One-off per-query timing harness for local iteration: run the named
  * queries (all of them when none are named) N passes each against an
  * sf dir, after one untimed warmup pass per query at sf0.001, and
  * print min/med times. The hygiene matches Bench (per-pass scratch
  * release) so numbers are comparable with BENCH_QUIET medians without
  * paying a full 3-pass 144-query section while iterating on one
  * operator. Not part of Verify/Bench; run by hand:
  *
  *   runMain graft.tools.QTime /root/testdata/sf0.1 q131_pagerank q144_incremental_pagerank
  */
object QTime {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val all = SparkEntry.queries.toSeq.sortBy(_._1)
    val picked = if (names.isEmpty) all
      else all.filter { case (n, _) => names.exists(n.startsWith) }
    def release(): Unit = spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    picked.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      release()
    }
    picked.foreach { case (name, fn) =>
      val ts = Seq.fill(3) {
        val t0 = System.nanoTime()
        val t = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
          catch { case e: Throwable =>
            System.err.println(s"[qtime] $name failed: ${e.getMessage}"); -1.0 }
        release()
        t
      }.sorted
      println(f"[qtime] $name%-32s min=${ts.head}%.2f med=${ts(1)}%.2f max=${ts(2)}%.2f")
    }
    spark.stop()
  }
}
