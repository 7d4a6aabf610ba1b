package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.CorpusStream

/** The unbucketed->bucketed state migration: state written by a
  * pre-bucketing engine version (flat, no bucket column) must fold
  * cleanly after an upgrade — ensureBucketed rewrites it once, and the
  * dedup semantics carry across the layout change. */
class StateStoreSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a flat pre-upgrade hash store migrates on first fold; dedup is unbroken") {
    val docs = Tables.load(spark, sf, "documents")
    val state = Files.createTempDirectory("migrate-state").toString
    val first = docs.filter(col("doc_id") < 250)

    CorpusStream.foldBatch(first, state)
    val docsAfterFirst = spark.read.parquet(s"$state/docs").count()

    // simulate the OLD layout: strip the bucket column and partitioning
    val flat = spark.read.parquet(s"$state/hashes")
      .select("content_hash").collect().map(_.getString(0)).toSeq
    import spark.implicits._
    graft.sinks.Sinks.snapshotSwap(flat.toDF("content_hash"), s"$state/hashes")
    assert(!spark.read.parquet(s"$state/hashes").columns.contains("hb"))

    // replay the same batch against the flat store: the fold must
    // migrate the layout and still drop every already-seen doc
    CorpusStream.foldBatch(first, state)
    assert(spark.read.parquet(s"$state/hashes").columns.contains("hb"),
      "the fold must have rewritten the store bucketed")
    assert(spark.read.parquet(s"$state/docs").count() === docsAfterFirst,
      "dedup must hold across the layout migration — no re-admitted docs")

    // and a genuinely new batch still lands
    CorpusStream.foldBatch(docs.filter(col("doc_id") >= 250), state)
    assert(spark.read.parquet(s"$state/docs").count() > docsAfterFirst)
  }
}
