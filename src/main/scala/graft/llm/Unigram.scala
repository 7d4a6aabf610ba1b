package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Staging

/** Unigram-LM (SentencePiece-style) Viterbi segmentation — the OTHER
  * tokenizer family next to BPE (Kudo 2018, arXiv:1804.10959 §3): a
  * piece inventory with log-probabilities, and each word tokenized as
  * its maximum-likelihood segmentation. [[Bpe]] covers merge-rule
  * training; this module covers the unigram side's inventory seeding
  * and INFERENCE — the Viterbi DP that is also SentencePiece's encode
  * path and the E-step of its EM trainer (full EM training is the
  * natural next increment on top of this DP).
  *
  * Determinism (the oracle-row discipline):
  *  - the inventory is the top-S substrings by weighted occurrence
  *    count (ties lexicographic) plus every single character seen —
  *    coverage: any corpus word is segmentable char-by-char;
  *  - log-probs are ROUNDED to 6 dp (ln is only ~1-ulp reproducible
  *    across engines; rounding collapses it before any comparison);
  *  - the DP compares candidate scores as (score, split-point) structs,
  *    so ties break on the LARGER split point identically in Spark's
  *    `array_max` and the oracle's ORDER BY s DESC, j DESC.
  *
  * Scale shape: the inventory is one substring explode (maxLen-bounded,
  * map-side-combined count) + a TakeOrdered(S) — never a global sort;
  * segmentation is MAP-ONLY over the word histogram (the bounded
  * inventory rides a broadcast as a map literal, the DP and backtrace
  * are in-row `aggregate` lambdas) — the corpus itself is touched once
  * for the histogram, the Heaps'-law vocabulary does the rest, exactly
  * the [[Bpe]] cost model.
  */
object Unigram {

  /** Top-S substring inventory with 6 dp-rounded log-probs.
    * @param words (word, cnt) histogram
    * @return (piece, pcnt, logp) */
  def inventory(words: DataFrame, maxLen: Int, topS: Int): DataFrame = {
    val subs = Staging.stage(words
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, length(word)), s ->
              filter(transform(sequence(1, $maxLen), l ->
                CASE WHEN s + l - 1 <= length(word)
                     THEN substring(word, s, l) END),
                x -> x IS NOT NULL)))""")).as("piece"))
      .groupBy("piece").agg(sum(col("cnt")).as("pcnt")))
    val top = subs.orderBy(col("pcnt").desc, col("piece")).limit(topS)
    val singles = subs.filter(length(col("piece")) === 1)
    val inv0 = Staging.stage(top.unionByName(singles).distinct())
    val tot = inv0.agg(sum("pcnt").cast("double").as("t"))
    inv0.crossJoin(broadcast(tot))
      .select(col("piece"), col("pcnt"),
        round(log(col("pcnt") / col("t")), 6).as("logp"))
  }

  /** Maximum-likelihood piece count per word: the Viterbi DP over
    * positions 1..len (best[i] = max over piece lengths l of
    * best[i-l] + logp(word[i-l+1..i])) followed by the backpointer
    * walk, both as in-row lambdas against the broadcast inventory map.
    * Requires the inventory to cover every character of every word
    * (guaranteed when it came from [[inventory]] over the same corpus).
    * @return (word, cnt, n_pieces) */
  def segmentCounts(words: DataFrame, inv: DataFrame, maxLen: Int): DataFrame = {
    val pm = inv.agg(map_from_entries(
      collect_list(struct(col("piece"), col("logp")))).as("pm"))
    words.crossJoin(broadcast(pm))
      .withColumn("m", expr(
        s"""aggregate(sequence(1, length(word)),
              array(named_struct('s', CAST(0 AS DOUBLE), 'j', 0)),
              (acc, i) -> array_append(acc,
                array_max(filter(transform(sequence(1, least(i, $maxLen)), l ->
                  CASE WHEN try_element_at(pm, substring(word, i - l + 1, l))
                            IS NOT NULL
                       THEN named_struct(
                         's', element_at(acc, i - l + 1).s
                              + try_element_at(pm, substring(word, i - l + 1, l)),
                         'j', i - l)
                  END), x -> x IS NOT NULL))))"""))
      .withColumn("n_pieces", expr(
        """aggregate(sequence(1, length(word)),
             named_struct('pos', length(word), 'n', 0),
             (acc, x) -> CASE WHEN acc.pos > 0
               THEN named_struct('pos', element_at(m, acc.pos + 1).j,
                                 'n', acc.n + 1)
               ELSE acc END).n"""))
      .select(col("word"), col("cnt"),
        col("n_pieces").cast("long").as("n_pieces"))
  }
}
