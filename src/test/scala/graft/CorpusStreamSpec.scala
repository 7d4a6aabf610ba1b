package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipelines.CorpusPipeline
import graft.streaming.{CorpusStream, NearDup}

/** Stream == batch for the composed corpus pipeline: folding the corpus
  * through CorpusStream in id-ordered micro-batches and finalizing must
  * produce the batch `CorpusPipeline.run` output byte-for-byte — gate,
  * dedup, collapse, decontamination, mix, and packing all included.
  */
class CorpusStreamSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def benchOf(docs: org.apache.spark.sql.DataFrame) =
    docs.filter(col("doc_id") < 10).select("doc_id", "text")

  private def collectPacked(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(df.columns.sorted.toIndexedSeq.map(col): _*)
      .collect().map(_.mkString("|")).sorted.toSeq

  test("foldBatch split ingest + finalize == one batch CorpusPipeline.run") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = benchOf(docs)
    val (batchOut, batchReport) = CorpusPipeline.run(docs, bench)

    val state = Files.createTempDirectory("corpus-stream-state").toString
    CorpusStream.foldBatch(docs.filter(col("doc_id") < 250), state)
    CorpusStream.foldBatch(docs.filter(col("doc_id") >= 250), state)
    val (streamOut, streamReport) = CorpusStream.finalize(
      spark, state, NearDup.benchmarkShingleHashes(bench))

    assert(streamOut.columns.sorted.toSeq === batchOut.columns.sorted.toSeq)
    assert(collectPacked(streamOut) === collectPacked(batchOut))
    // the shared tail stages must agree on row counts too
    val batchTail = batchReport.filter(r =>
      !Set("gate_scrub", "exact_dedup").contains(r.stage))
    assert(streamReport === batchTail)
  }

  test("sink drains a file stream through the fold (checkpointed wiring)") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = benchOf(docs)
    // two id-ordered "pages" with distinct mtimes: the file source drains
    // oldest-first, so arrival order is id-ascending — the order where
    // first-arrival-wins dedup equals the batch pipeline's first-id-wins
    // (see the CorpusStream docstring for the out-of-order posture)
    val in = Files.createTempDirectory("corpus-stream-in").toString
    docs.filter(col("doc_id") < 250).coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1100)
    docs.filter(col("doc_id") >= 250).coalesce(1).write.mode("append").parquet(in)
    val schema = spark.read.parquet(in).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(in)

    val state = Files.createTempDirectory("corpus-sink-state").toString
    val q = CorpusStream.sink(stream, state,
      Files.createTempDirectory("corpus-sink-ckpt").toString)
    q.awaitTermination(120000)

    val (streamOut, _) = CorpusStream.finalize(
      spark, state, NearDup.benchmarkShingleHashes(bench))
    val (batchOut, _) = CorpusPipeline.run(docs, bench)
    // arbitrary micro-batch boundaries: the accumulated corpus must match
    // the batch gate+dedup set, and the finalized output the batch run —
    // content equality is the contract; doc order inside batches is not
    assert(collectPacked(streamOut) === collectPacked(batchOut))
  }

  test("compacted state folds and finalizes identically (fewer files, same corpus)") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = benchOf(docs)
    val state = Files.createTempDirectory("corpus-compact-state").toString
    CorpusStream.foldBatch(docs.filter(col("doc_id") < 150), state)
    CorpusStream.foldBatch(docs.filter(col("doc_id").between(150, 299)), state)
    val before = TestFiles.parquetFileCount(s"$state/docs")
    CorpusStream.compactState(spark, state)
    assert(TestFiles.parquetFileCount(s"$state/docs") < before,
      "compaction must reduce the per-batch small-file accretion")
    // the compacted state is still foldable and finalizes to batch parity
    CorpusStream.foldBatch(docs.filter(col("doc_id") >= 300), state)
    val (streamOut, _) = CorpusStream.finalize(
      spark, state, NearDup.benchmarkShingleHashes(bench))
    val (batchOut, _) = CorpusPipeline.run(docs, bench)
    assert(collectPacked(streamOut) === collectPacked(batchOut))
  }

  test("replayed fold (same batch twice) does not change the finalized corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = benchOf(docs)
    val state = Files.createTempDirectory("corpus-replay-state").toString
    val first = docs.filter(col("doc_id") < 250)
    CorpusStream.foldBatch(first, state)
    CorpusStream.foldBatch(first, state) // at-least-once redelivery
    CorpusStream.foldBatch(docs.filter(col("doc_id") >= 250), state)
    val (streamOut, _) = CorpusStream.finalize(
      spark, state, NearDup.benchmarkShingleHashes(bench))
    val (batchOut, _) = CorpusPipeline.run(docs, bench)
    assert(collectPacked(streamOut) === collectPacked(batchOut))
  }
}
