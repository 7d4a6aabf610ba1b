package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming BM25 index maintenance — the dedup-state discipline
  * applied to lexical retrieval: documents arrive in micro-batches and
  * fold into a persisted inverted index, so BM25 queries (q128's exact
  * semantics, scored by the shared [[graft.llm.Bm25]] arithmetic) stay
  * current without re-tokenizing the corpus.
  *
  * State under `statePath`:
  *  - `postings/` (term, doc_id, dl, tf), partitioned by a term-hash
  *    bucket — the scoring probe partition-prunes to the workload
  *    terms' buckets, so query-time IO is matched-postings-sized
  *    however big the index;
  *  - `docs/` (doc_id, dl), partitioned by a doc-hash bucket — the slim
  *    per-document metadata behind the corpus scalars (N, avgdl);
  *    empty-token documents live ONLY here, and they matter (they pull
  *    avgdl down exactly as in the batch pass).
  *
  * Replay safety: EACH table novelty-guards its own appends through
  * [[StateStore.novelAgainst]] (docs on doc_id; postings on
  * (term, doc_id)), so at-least-once redelivery converges per table —
  * no additive counter state anywhere (the EventReports rule: derive
  * aggregates from novelty-guarded row stores, never maintain counts
  * that a replay would double). A crash between the two appends leaves
  * a transient skew between postings and docs that the replay closes.
  *
  * Query-time cost, disclosed: the workload pick re-derives df from the
  * posting store — a keyed count with map-side partials over
  * tf-COLLAPSED rows (no tokenization, no distinct; output Heaps-law
  * bounded) — and the scalars from the slim docs store. Fold cost is
  * ∝ delta; a deployment with a fixed (not data-derived) query workload
  * skips the df pass entirely and goes straight to the pruned probe.
  */
object Bm25Index {

  private def postingsPath(state: String) = s"$state/postings"
  private def docsPath(state: String) = s"$state/docs"

  /** Term/doc hash-bucket modulus — the ClusterMaintenance layout
    * contract (32 matches the session shuffle parallelism at test
    * scale; a 100 TB deployment raises it, and `ensureBucketed`
    * detects + rewrites via the `_buckets` marker). */
  private val stateBuckets = 32
  private def termBucket(t: Column): Column =
    pmod(xxhash64(t), lit(stateBuckets)).cast("int")
  private def docBucket(id: Column): Column =
    pmod(xxhash64(id), lit(stateBuckets)).cast("int")

  /** Fold one micro-batch of documents (`doc_id`, `text`) into the
    * persisted index. Tokenization runs ONCE per batch (staged), and the
    * staged batch's row count feeds both novelty probes as the
    * `deltaRows` hint — a delta far bigger than the bucket count has
    * touched every bucket with near-certainty, so the probes skip their
    * touched-bucket collect jobs (StateStore.prunedByTouched) instead of
    * paying one per table per fold. Each state table appends only its
    * novel rows, ≤ `stateBuckets` files. */
  def foldBatch(batch: DataFrame, statePath: String): Unit = {
    val spark = batch.sparkSession
    val toks = graft.core.Staging.stage(
      batch.select(col("doc_id"),
          expr(graft.queries.Llm.toksExpr).as("tk"))
        .select(col("doc_id"), col("tk"),
          size(col("tk")).cast("long").as("dl")))
    // the empty-batch early-out reads the staged frame (cheap), not the
    // source — the old batch.isEmpty probe cost a scan job per fold
    val nDocs = toks.count()
    if (nDocs == 0) return

    val docsDelta = toks.select(col("doc_id"), col("dl"))
      .withColumn("db", docBucket(col("doc_id")))
    StateStore.ensureBucketed(spark, docsPath(statePath), "db",
      docBucket(col("doc_id")), stateBuckets)
    val novelDocs = StateStore.novelAgainst(docsPath(statePath), docsDelta,
      Seq("doc_id"), "db", docBucket(col("doc_id")), stateBuckets,
      deltaRows = nDocs)
    StateStore.appendBucketed(novelDocs, docsPath(statePath), "db",
      stateBuckets)

    val postDelta = toks
      .select(col("doc_id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("term")))
    StateStore.ensureBucketed(spark, postingsPath(statePath), "tb",
      termBucket(col("term")), stateBuckets)
    // nDocs is a LOWER bound on posting rows — valid for the hint's
    // "delta ≫ buckets" direction (it can only under-skip, never
    // mis-prune)
    val novelPost = StateStore.novelAgainst(postingsPath(statePath),
      postDelta, Seq("term", "doc_id"), "tb", termBucket(col("term")),
      stateBuckets, deltaRows = nDocs)
    StateStore.appendBucketed(novelPost, postingsPath(statePath), "tb",
      stateBuckets)
  }

  /** Compact the append-only stores (exact-row dedup + file coalesce +
    * marker restamp) — callers wire it on a batch cadence, like the
    * cluster state's. */
  def compact(spark: SparkSession, statePath: String): Unit = {
    StateStore.compactBucketed(spark, postingsPath(statePath), "tb",
      stateBuckets)
    StateStore.compactBucketed(spark, docsPath(statePath), "db",
      stateBuckets)
  }

  /** Answer the q128 retrieval from the persisted index: re-derive the
    * data-derived workload (df ranks + idf, STAGED — three consumers),
    * then score ONLY the workload terms' postings via a
    * partition-pruned read. An index nobody has folded yet answers
    * EMPTY, not PATH_NOT_FOUND (the streaming-startup-race rule).
    * @return (query_id, doc_id, score) — unordered */
  def topK(spark: SparkSession, statePath: String): DataFrame = {
    if (!StateStore.exists(spark, postingsPath(statePath)))
      return spark.range(0).select(col("id").as("query_id"),
        col("id").as("doc_id"), col("id").cast("double").as("score"))
    val post = spark.read.parquet(postingsPath(statePath))
    val dfTab = post.groupBy("term").agg(count(lit(1)).as("df"))
    val scalars = spark.read.parquet(docsPath(statePath))
      .agg(count(lit(1)).as("nd"), sum("dl").as("sumdl"))
    val qterms = graft.core.Staging.stage(
      graft.llm.Bm25.workload(dfTab, scalars))
    val probes = qterms.withColumn("tb", termBucket(col("term")))
    val pruned = StateStore.prunedByTouched(spark, postingsPath(statePath),
      "tb", probes, col("tb"))
    graft.llm.Bm25.topkFromTf(
      pruned.select("term", "doc_id", "dl", "tf"), qterms)
  }
}
