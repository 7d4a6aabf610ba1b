package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Shards

/** The training-shard export contract: exact sizes, one file per shard,
  * reproducible byte-identical re-export, and a sequential read-back
  * that replays the global seeded-hash order. */
class ShardsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus = Tables.load(spark, sf, "documents")
    .withColumn("h", md5(concat_ws("|", col("doc_id").cast("string"), col("text"))))

  test("shards hold exactly rowsPerShard rows (last takes the remainder)") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val n = Shards.write(corpus, dir, rowsPerShard = 64, order = col("h"))
    val total = corpus.count()
    assert(n === (total + 63) / 64)
    val sizes = spark.read.parquet(dir).groupBy("shard").count()
      .collect().map(r => r.getAs[Number]("shard").longValue() -> r.getLong(1)).toMap
    (0L until n).foreach { s =>
      val want = if (s == n - 1) total - 64 * (n - 1) else 64L
      assert(sizes(s) === want, s"shard $s")
    }
  }

  test("one parquet file per shard directory") {
    val dir = java.nio.file.Files.createTempDirectory("shards-files").toString
    val n = Shards.write(corpus, dir, rowsPerShard = 100, order = col("h"))
    (0L until n).foreach { s =>
      val files = new java.io.File(s"$dir/shard=$s").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1, s"shard $s must be one file, got ${files.length}")
    }
  }

  test("re-export is byte-identical (deterministic order + placement)") {
    val d1 = java.nio.file.Files.createTempDirectory("shards-a").toString
    val d2 = java.nio.file.Files.createTempDirectory("shards-b").toString
    Shards.write(corpus, d1, 75, col("h"))
    Shards.write(corpus, d2, 75, col("h"))
    assert(TestFiles.partFileHashes(d1).values.toSeq.sorted ===
      TestFiles.partFileHashes(d2).values.toSeq.sorted)
  }

  test("the corpus pipeline's packed output exports as training shards") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = docs.filter(col("doc_id") < 10).select("doc_id", "text")
    val (packed, _) = graft.pipelines.CorpusPipeline.run(docs, bench)
    val dir = java.nio.file.Files.createTempDirectory("shards-pipeline").toString
    val n = graft.pipelines.CorpusPipeline.export(packed, dir, rowsPerShard = 100)
    val total = packed.count()
    assert(n === (total + 99) / 100)
    assert(spark.read.parquet(dir).count() === total,
      "every packed row must land in exactly one shard")
  }

  test("empty corpus exports zero shards — no NPE, no stale export left behind") {
    val dir = java.nio.file.Files.createTempDirectory("shards-empty").toString
    val n = Shards.write(corpus.filter(lit(false)), dir, 64, col("h"))
    assert(n === 0)
    assert(!new java.io.File(dir).exists(), "an empty export must leave no path")
    // re-export over a previous full export: the stale shards AND their
    // manifest must go — otherwise verify() would certify yesterday's
    // corpus as current
    val dir2 = java.nio.file.Files.createTempDirectory("shards-stale").toString
    Shards.write(corpus, dir2, 64, col("h"))
    val n2 = Shards.write(corpus.filter(lit(false)), dir2, 64, col("h"))
    assert(n2 === 0)
    assert(!new java.io.File(dir2).exists(),
      "an empty re-export must remove the stale previous export")
  }

  test("manifest census matches the export; total rows accounted for") {
    val dir = java.nio.file.Files.createTempDirectory("shards-manifest").toString
    val n = Shards.write(corpus, dir, 64, col("h"))
    val m = Shards.manifest(spark, dir)
    assert(m.count() === n, "one manifest row per shard")
    assert(m.agg(sum("rows")).collect()(0).getLong(0) === corpus.count(),
      "manifest row counts must sum to the corpus")
    assert(Shards.verify(spark, dir).isEmpty,
      "a fresh export must verify clean")
  }

  test("a missing manifest is a verify FINDING, not a read error") {
    // the crash window between shard write and manifest write leaves
    // shards with no _manifest/ — the one partial-export shape the
    // integrity check most needs to report, so it must describe it
    // instead of dying on PATH_NOT_FOUND
    val dir = java.nio.file.Files.createTempDirectory("shards-nomanifest").toString
    Shards.write(corpus, dir, 64, col("h"))
    val mp = new java.io.File(s"$dir/_manifest")
    def rmTree(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
    }
    rmTree(mp)
    val findings = Shards.verify(spark, dir)
    assert(findings.nonEmpty && findings.head.contains("manifest missing"),
      s"absent manifest must surface as an incomplete-export finding: $findings")
  }

  test("a tampered shard is detected by the census") {
    val dir = java.nio.file.Files.createTempDirectory("shards-tamper").toString
    Shards.write(corpus, dir, 64, col("h"))
    // clobber shard=1's file with shard=0's bytes: the file count and
    // row count stay plausible, but ranks and content hash disagree
    def part(s: Int) = new java.io.File(f"$dir/shard=$s").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part(0).toPath, part(1).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the stale LocalFileSystem .crc so the read reaches the census
    new java.io.File(s"$dir/shard=1").listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(_.delete())
    val bad = Shards.verify(spark, dir)
    assert(bad.nonEmpty && bad.forall(_.startsWith("shard 1")),
      s"tamper must implicate shard 1 only: $bad")
  }

  test("sequential read-back replays the global hash order") {
    val dir = java.nio.file.Files.createTempDirectory("shards-order").toString
    Shards.write(corpus, dir, 80, col("h"))
    val back = Shards.read(spark, dir).select("h").collect().map(_.getString(0))
    assert(back.toSeq === back.toSeq.sorted, "read-back must be in hash order")
    assert(back.length === corpus.count())
  }
}
