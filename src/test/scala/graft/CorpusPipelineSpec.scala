package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipelines.CorpusPipeline

/** The composed corpus-preparation pipeline (pipelines/CorpusPipeline):
  * stage wiring, monotone shrinkage, determinism, packing invariants. */
class CorpusPipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  private def inputs = {
    val docs = Tables.load(spark, sf, "documents")
    (docs, docs.filter(col("doc_id") < 10).select("doc_id", "text"))
  }

  test("stages run in order, shrink monotonically, and packing preserves rows") {
    val (docs, bench) = inputs
    val (packed, report) = CorpusPipeline.run(docs, bench)
    assert(report.map(_.stage) === Seq("gate_scrub", "exact_dedup",
      "neardup_collapse", "decontaminate", "temperature_sample", "seq_packing"))
    val counts = report.map(_.rowsOut)
    assert(counts.head > 0, "the gate must keep a non-trivial corpus")
    assert(counts.sliding(2).forall { case Seq(a, b) => b <= a },
      s"every stage filters, never invents rows: $counts")
    assert(counts(5) === counts(4), "packing reorganizes, it must not drop")
    assert(packed.count() === counts(5))
  }

  test("output docs are gated input docs; packing starts each source at seq 0") {
    val (docs, bench) = inputs
    val (packed, _) = CorpusPipeline.run(docs, bench)
    val out = packed.select("doc_id").collect().map(_.getLong(0)).toSet
    val in = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.subsetOf(in))
    val firstSeqs = packed
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")))
      .filter(col("rn") === 1).select("seq_id")
      .collect().map(_.getLong(0)).toSet
    assert(firstSeqs === Set(0L), "each source's packing must start at sequence 0")
  }

  test("the pipeline is deterministic run-over-run") {
    val (docs, bench) = inputs
    val (p1, r1) = CorpusPipeline.run(docs, bench)
    val (p2, r2) = CorpusPipeline.run(docs, bench)
    assert(r1 === r2)
    val k1 = p1.select("doc_id", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val k2 = p2.select("doc_id", "seq_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(k1 === k2)
  }

  test("reliable staging yields the identical corpus and reclaims its scratch") {
    val (docs, bench) = inputs
    val (pLocal, rLocal) = CorpusPipeline.run(docs, bench)
    val localKeys = pLocal.select("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val dir = java.nio.file.Files.createTempDirectory("corpus-reliable").toString
    spark.conf.set("spark.graft.staging.dir", dir)
    spark.conf.set("spark.graft.staging", "reliable")
    try {
      val mark = graft.core.Staging.mark(spark)
      val (pRel, rRel) = CorpusPipeline.run(docs, bench)
      val relKeys = pRel.select("doc_id", "seq_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(relKeys === localKeys)
      assert(rRel === rLocal)
      assert(graft.core.Staging.reclaim(spark, mark) > 0,
        "the run must have tracked reclaimable staging")
      assert(new java.io.File(dir).listFiles().isEmpty,
        "run-end reclaim must empty the pipeline's staging scratch")
    } finally {
      spark.conf.unset("spark.graft.staging")
      spark.conf.unset("spark.graft.staging.dir")
    }
  }
}
