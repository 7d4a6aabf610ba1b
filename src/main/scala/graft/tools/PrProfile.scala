package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.streaming.PageRankStream

/** One-off phase profiler for the streaming-PageRank query shape (q144):
  * fold(seed) / fold(rest) / re-rank, timed separately, with a per-job
  * listener (callsite + wall time) on the last pass, plus a staged-vs-
  * lazy re-rank comparison. Local iteration only — not part of
  * Verify/Bench. Run:
  *
  *   runMain graft.tools.PrProfile /root/testdata/sf0.1
  */
object PrProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val sc = spark.sparkContext
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var trace = false
    val traceEpoch = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
    sc.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (trace) {
          val site = js.stageInfos.headOption.map(_.name).getOrElse("?")
          jobStarts.put(js.jobId, (System.nanoTime(), site))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (trace) Option(jobStarts.remove(je.jobId)).foreach { case (t0, site) =>
          val at = (t0 - traceEpoch.get) / 1e9
          println(f"[job] @$at%7.2f ${(System.nanoTime() - t0) / 1e9}%6.2f s  $site")
        }
    })
    val docs = graft.core.Tables.load(spark, sfDir, "documents")
    def release(): Unit = sc.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    def lazyRanks(state: String): Long = {
      val nodes = spark.read.parquet(s"$state/nodes").select("doc_id")
      val pairs = spark.read.parquet(s"$state/edges").select("doc_a", "doc_b")
      graft.llm.PageRank.ranks(nodes, pairs, stageIterations = false)
        .orderBy("doc_id").count()
    }
    for (pass <- 0 to 3) {
      trace = pass == 3
      val state = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(GraftSession.fastScratch), "prprof").toString
      def t[A](n: String)(f: => A): A = {
        val t0 = System.nanoTime(); val r = f
        if (pass > 0) println(f"[prprof $pass] $n%-8s ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      if (trace) println("[job] ---- fold1 ----")
      t("fold1")(PageRankStream.foldBatch(docs.filter(col("doc_id") < 250), state))
      if (trace) println("[job] ---- fold2 ----")
      t("fold2")(PageRankStream.foldBatch(docs.filter(col("doc_id") >= 250), state))
      if (trace) println("[job] ---- ranks (staged) ----")
      t("staged")(PageRankStream.ranks(spark, state).orderBy("doc_id").count())
      if (trace) println("[job] ---- ranks (lazy, count-consumed) ----")
      // CAUTION: a count()-shaped consumer lets column pruning DELETE
      // the rank arithmetic (only join multiplicity survives) — these
      // two lines measure plan scaffolding, not the re-rank. The ckpt
      // line below is the REAL materialized cost; the gap between them
      // is what mis-led the round-13 staged-vs-lazy comparison.
      t("lazy")(lazyRanks(state))
      t("lazy2")(lazyRanks(state))
      if (trace) println("[job] ---- ranks (lazy, materialized) ----")
      t("ckpt")(PageRankStream.ranks(spark, state)
        .localCheckpoint(eager = true).count())
      def ranksVariant(staged: Boolean): Long = {
        val nodes = spark.read.parquet(s"$state/nodes").select("doc_id")
        val pairs = spark.read.parquet(s"$state/edges").select("doc_a", "doc_b")
        graft.llm.PageRank.ranks(nodes, pairs, stageIterations = staged)
          .localCheckpoint(eager = true).count()
      }
      if (trace) println("[job] ---- ranks (staged iters, materialized) ----")
      t("ckptSt")(ranksVariant(staged = true))
      if (trace) println("[job] ---- ranks (lazy, materialized 2) ----")
      t("ckptNh")(ranksVariant(staged = false))
      release()
      val st = java.nio.file.Files.walk(java.nio.file.Paths.get(state))
      try st.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally st.close()
    }
    // the REGISTERED query body, traced — catches any cost the direct
    // phase calls above don't pay (scratch wrapper, final staging, ...)
    trace = false
    graft.SparkEntry.queries("q144_incremental_pagerank")(spark, sfDir).count()
    release()
    trace = true
    traceEpoch.set(System.nanoTime())
    val t0 = System.nanoTime()
    graft.SparkEntry.queries("q144_incremental_pagerank")(spark, sfDir).count()
    println(f"[prprof] registered q144 ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
