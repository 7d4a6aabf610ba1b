package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.F
import graft.lineage.RunTelemetry

/** I5 run telemetry + F19 duration formatting. */
class TelemetrySpec extends SparkSpec {

  private def await(cond: => Boolean, ms: Long = 10000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("I5: listener captures rows + elapsed for a write action") {
    import spark.implicits._
    val t = RunTelemetry.attach(spark, "run-1")
    try {
      val p = Files.createTempDirectory("telemetry").toString + "/t"
      (1 to 42).toDF("x").write.parquet(p)
      assert(await(t.reports.exists(r => r.rows == 42L && r.elapsedMs >= 0)),
        s"expected a captured write of 42 rows, got: ${t.reports}")
      val r = t.reports.find(_.rows == 42L).get
      assert(r.runId === "run-1")
    } finally t.detach()
  }

  test("I5: reportFrame carries pretty elapsed; summaryLines formatted") {
    import spark.implicits._
    val t = RunTelemetry.attach(spark, "run-2")
    try {
      (1 to 3).toDF("x").count()
      assert(await(t.reports.nonEmpty))
      val row = t.reportFrame.select("runId", "elapsed_pretty").collect().head
      assert(row.getString(0) === "run-2")
      assert(row.getString(1).matches("\\d+h \\d+m \\d+s"))
      assert(t.summaryLines.head.startsWith("run=run-2 action="))
    } finally t.detach()
  }

  test("F19: durationPretty formats h/m/s") {
    import spark.implicits._
    val out = Seq(3725L, 59L, 3600L).toDF("s")
      .select(F.durationPretty(col("s")).as("p"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("1h 2m 5s", "0h 0m 59s", "1h 0m 0s"))
  }

  test("flagship SnapshotSync emits a run report per materializing action") {
    // run() prints [run-report] lines; assert the telemetry hook captured
    // at least the snapshot-swap write with real rows
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      SparkEntry.entry(spark).count()
    }
    val lines = out.toString.linesIterator.filter(_.startsWith("[run-report]")).toSeq
    assert(lines.nonEmpty, "expected [run-report] lines from the flagship run")
    assert(lines.exists(_.matches(".*rows=\\d+.*elapsed=\\d+ms.*")))
    // the second flagship (corpus pipeline) reports through the same
    // telemetry struct — every stage rides a [run-report] line, not a
    // bare println
    val stages = Seq("gate_scrub", "exact_dedup", "neardup_collapse",
      "decontaminate", "temperature_sample", "seq_packing")
    stages.foreach { st =>
      assert(lines.exists(_.matches(s".*action=corpus:$st rows=\\d+.*")),
        s"missing corpus stage report for $st in: ${lines.take(8)}")
    }
  }

  test("components level telemetry reports residue sizes through the run report") {
    import spark.implicits._
    val t = RunTelemetry.attach(spark, "run-4")
    try {
      // an 8-node path needs several contraction levels; each level's
      // residue edge count lands in the report, strictly shrinking to 0
      val edges = (1L to 7L).map(i => i -> (i + 1)).toDF("src", "dst")
      graft.operators.Components
        .connected(edges, observe = Some((st, n) => t.record(st, n)))
        .count()
      val levels = t.reports.filter(_.action.startsWith("components:level"))
        .sortBy(_.action)
      assert(levels.nonEmpty, "each contraction level must report")
      assert(levels.map(_.rows) === levels.map(_.rows).sorted.reverse,
        s"residue must shrink monotonically: ${levels.map(r => r.action -> r.rows)}")
      assert(levels.last.rows === 0L, "the final level's residue is empty")
      assert(t.summaryLines.exists(_.contains("components:level0_residue_edges")))

      // the star fallback's engagement is visible too
      graft.operators.Components.connected(edges, maxRounds = 0,
        observe = Some((st, n) => t.record(st, n)))
        .count()
      assert(t.reports.exists(r =>
        r.action == "components:star_fallback_residue_edges" && r.rows > 0))
    } finally t.detach()
  }

  test("k-means and BPE training report per-iteration telemetry") {
    import spark.implicits._
    val t = RunTelemetry.attach(spark, "run-5")
    try {
      val vecs = (1L to 20L)
        .map(i => (i, Seq.fill(4)((i % 5).toFloat))).toDF("vec_id", "embedding")
      graft.llm.Kmeans.train(vecs, k = 3, iters = 2,
        observe = Some((st, n) => t.record(st, n))).count()
      val cells = t.reports.filter(_.action.startsWith("kmeans:iter"))
      assert(cells.map(_.action) === Seq("kmeans:iter1_active_cells",
        "kmeans:iter2_active_cells"))
      assert(cells.forall(r => r.rows >= 1 && r.rows <= 3))

      val words = Seq(("aaaa", 10L), ("ab", 2L)).toDF("word", "cnt")
      graft.llm.Bpe.train(words, steps = 2,
        observe = Some((st, n) => t.record(st, n)))._2.count()
      val pairs = t.reports.filter(_.action.contains("bpe:step")).sortBy(_.action)
      assert(pairs.map(_.action) === Seq(
        "bpe:step1_pair_count", "bpe:step1_vocab_symbols",
        "bpe:step2_pair_count", "bpe:step2_vocab_symbols"))
      // compression curve: aaaa(4)+ab(2)=6 chars -> step1 [aa,aa]+[a,b]=4
      // -> step2 [aaaa]+[a,b]=3
      val syms = pairs.filter(_.action.endsWith("vocab_symbols")).map(_.rows)
      assert(syms === Seq(4L, 3L))
    } finally t.detach()
  }

  test("record() rides the same struct as listener-captured actions") {
    val t = RunTelemetry.attach(spark, "run-3")
    try {
      t.record("corpus:gate_scrub", 151L)
      val r = t.reports.find(_.action == "corpus:gate_scrub").get
      assert(r.runId === "run-3" && r.rows === 151L)
      val row = t.reportFrame.filter(col("action") === "corpus:gate_scrub")
        .select("rows").collect().head
      assert(row.getLong(0) === 151L)
      assert(t.summaryLines.exists(_.contains("action=corpus:gate_scrub rows=151")))
    } finally t.detach()
  }
}
