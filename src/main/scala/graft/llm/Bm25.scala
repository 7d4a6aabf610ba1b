package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Okapi BM25 scoring (Robertson & Zaragoza 2009), shared between the
  * batch retrieval query (q128) and the streaming index's query path
  * ([[graft.streaming.Bm25Index]]) — ONE implementation of the ranking
  * arithmetic, so the streamed index provably answers the batch oracle.
  *
  * Cross-engine / cross-path determinism: the only transcendental
  * (idf's ln; the Lucene +1 form, never negative) is quantized to 1e-7
  * fixed point the moment it is computed, each term's contribution is a
  * BIGINT on the same grid, and a document's score is an EXACT integer
  * sum — order-free however many terms a query has — ranked as an
  * integer with a doc_id tie-break and divided back to a double only at
  * emission.
  */
object Bm25 {

  /** The five two-term queries of the data-derived workload: terms at
    * df ranks 11–15 pair with ranks 21–25 (frequent enough to match at
    * every SF, rare enough to rank; ties break on the term; both bands
    * exist in the shipped fixtures' 31-type vocabulary, so every query
    * genuinely exercises the two-term score summation). The top-25 cut
    * is orderBy+limit — TakeOrderedAndProject, never a global sort of
    * the Heaps-law vocabulary; the rank window runs on the 25-row cut.
    * @param dfTab (term, df); @param scalars 1 row (nd, sumdl)
    * @return (query_id, term, idf_fp, nd, sumdl) — 10 rows */
  def workload(dfTab: DataFrame, scalars: DataFrame): DataFrame = {
    val wq = Window.orderBy(col("df").desc, col("term")) // 25-row frame
    dfTab.orderBy(col("df").desc, col("term")).limit(25)
      .withColumn("r", row_number().over(wq))
      .filter(col("r").between(11, 15) || col("r").between(21, 25))
      .withColumn("query_id",
        when(col("r") <= 15, col("r") - 11).otherwise(col("r") - 21)
          .cast("long"))
      .crossJoin(broadcast(scalars))
      .withColumn("idf_fp",
        round(log((col("nd") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)) * lit(1e7)).cast("long"))
      .select("query_id", "term", "idf_fp", "nd", "sumdl")
  }

  /** Top-5 documents per workload query from term-frequency rows. The
    * workload rides a broadcast (tf rows never shuffle to meet it) and
    * the per-query selection is the bounded-heap [[TopK]] aggregator —
    * map-side k-buffers, shuffle ∝ k·queries.
    * @param tfRows (term, doc_id, dl, tf) — may be pre-cut to workload
    *   terms or not; the broadcast join cuts either way
    * @return (query_id, doc_id, score) — score at 4 dp, UNORDERED
    *   (callers append their presentation sort) */
  def topkFromTf(tfRows: DataFrame, qterms: DataFrame): DataFrame = {
    val scored = tfRows.join(broadcast(qterms), Seq("term"))
      .withColumn("score_fp",
        round(col("idf_fp") * (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(1.0) - lit(0.75) +
            lit(0.75) * col("dl") /
              (col("sumdl").cast("double") / col("nd"))))).cast("long"))
      .groupBy("query_id", "doc_id").agg(sum("score_fp").as("s_fp"))
    val topk = TopK.topK(5)
    scored.groupBy("query_id")
      .agg(topk(col("doc_id"), col("s_fp").cast("double")).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("n"))
      .select(col("query_id"), col("n.id").as("doc_id"),
        round(col("n.score") / lit(1e7), 4).as("score"))
  }
}
