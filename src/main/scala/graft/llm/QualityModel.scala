package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality/filter classifier — logistic regression by full-batch
  * gradient descent, the model-based filtering tier of a training-data
  * pipeline (CCNet's fastText filter, Llama-style quality classifiers:
  * label documents with a cheap heuristic or a teacher, train a linear
  * model that generalizes it, score the corpus with the model). The
  * reference's ELT has no trained stage; this is the engine's
  * trained-model-as-oracle-row discipline (k-means q99, PQ q111, unigram
  * EM q116/q118) applied to supervised training.
  *
  * Scale shape: training is ITERATION-bounded, not data-bounded, in
  * everything but the per-iteration pass — each gradient step is ONE
  * map-side-combining aggregation over the feature frame (the sums cross
  * the shuffle as one row of DECIMAL(38,0) cells per partition), and the
  * model itself (a handful of weights) lives on the driver like the
  * k-means centroids. The standardization stats are one more aggregation
  * of the same shape. Nothing corpus-sized is ever collected, joined, or
  * windowed; scoring is map-only against literal weights.
  *
  * Determinism (the bit-replay contract with the DuckDB oracle):
  * everything lives on exact integer grids, and every transcendental is
  * quantized ON COMPUTATION —
  *  - features are 1e-6 fixed-point LONGs ([[xScale]]);
  *  - weights and probabilities are 1e-7 fixed-point LONGs ([[wScale]]);
  *  - the logit is an exact integer dot product (w·x in 1e-13 units)
  *    turned double by ONE cast+division;
  *  - the sigmoid output is immediately floored onto the 1e-7 grid, so
  *    residuals are exact integers and gradient sums are ORDER-FREE
  *    exact DECIMAL(38,0) integer sums — no float-summation-order seam;
  *  - every integer rounding is `floor(v + 0.5)` in BOTH engines:
  *    `round()` half-tie behavior differs between them on negatives
  *    (half-up vs half-away-from-zero), and standardized features ARE
  *    negative, so ties must share one definition. A double landing
  *    exactly on a half-integer is the same negligible-probability event
  *    as the unigram LSE quantization boundary (Unigram.scala §withAlpha)
  *    — accepted per quantization, and `floor(+0.5)` removes even that
  *    risk for the sign-dependent cases.
  * Standard deviations use IEEE `sqrt` (correctly rounded by spec, so
  * engine-independent); mu/sigma land on the 1e-6 grid via the same
  * floor. The per-step weight update floors `lr·g` onto the 1e-7 grid.
  *
  * Overflow budget: |xs| ≤ ~1e7 (a ±10-sigma feature), |residual| ≤ 1e7,
  * so gradient terms are ≤ 1e14 and the DECIMAL(38,0) sums hold 1e24
  * documents; the raw-moment sums (x², ≤ 1e12/doc) hold 1e26. The only
  * LONG-bounded quantity is the in-row dot product (≤ #features · 1e15).
  */
object QualityModel {

  /** Feature grid: 1e-6 units. */
  val xScale = 1000000L

  /** Weight / probability grid: 1e-7 units. */
  val wScale = 10000000L

  /** The tie-safe integer rounding shared with the oracle. */
  private def fl(v: Double): Long = math.floor(v + 0.5).toLong

  private def flCol(c: Column): Column = floor(c + lit(0.5))

  /** One training step: weights AFTER the update (1e-7 units, bias
    * first) and the correct-prediction count measured DURING the pass
    * (i.e. under the incoming weights). */
  case class Step(iter: Int, w: Seq[Long], nCorrect: Long)

  /** Standardization stats off the raw 1e-6-unit integer features in ONE
    * aggregation pass (n, Σx, Σx² as exact decimal sums); μ and σ derive
    * on the driver: μ = floor(Σx/n + .5), σ = max(floor(√((Σx² − 2μΣx +
    * nμ²)/n) + .5), 1) — the centered second moment stays an exact
    * integer because μ is already on the grid.
    * @return (n, mu, sd) in 1e-6 units, ordered as `cols` */
  def stats(raw: DataFrame, cols: Seq[String]): (Long, Seq[Long], Seq[Long]) = {
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(sum(col(c).cast("decimal(38,0)")).as(s"s_$c"),
        sum((col(c) * col(c)).cast("decimal(38,0)")).as(s"q_$c"))
    }
    val r = raw.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0)
    val stats = cols.zipWithIndex.map { case (_, i) =>
      val s = r.getDecimal(1 + 2 * i)
      val q = r.getDecimal(2 + 2 * i)
      val mu = fl(s.doubleValue / n.toDouble)
      val ssc = q.toBigInteger
        .subtract(java.math.BigInteger.valueOf(2 * mu).multiply(s.toBigInteger))
        .add(java.math.BigInteger.valueOf(mu)
          .multiply(java.math.BigInteger.valueOf(mu))
          .multiply(java.math.BigInteger.valueOf(n)))
      val sd = math.max(fl(math.sqrt(ssc.doubleValue / n.toDouble)), 1L)
      (mu, sd)
    }
    (n, stats.map(_._1), stats.map(_._2))
  }

  /** Map-only standardization: `xs_<c>` = floor((x − μ)·1e6/σ + .5)
    * (z-scores on the 1e-6 grid; the LONG multiply is exact and its
    * double image is ≤ 1e12, below 2^53), plus the unstandardized
    * `xs_bias` = 1e6. Passthrough of every other column. */
  def standardize(raw: DataFrame, cols: Seq[String],
                  mu: Seq[Long], sd: Seq[Long]): DataFrame = {
    val xs = cols.lazyZip(mu).lazyZip(sd).map { (c, m, s) =>
      flCol(((col(c) - lit(m)) * lit(xScale)).cast("double") / lit(s.toDouble))
        .as(s"xs_$c")
    }
    raw.select(col("*") +: (lit(xScale).as("xs_bias") +: xs.toSeq): _*)
  }

  /** The sigmoid pass under weights `w` (1e-7 units, aligned with
    * `xsCols`): adds `p` = floor(1e7·σ(w·x) + .5) — the probability on
    * the 1e-7 grid. The logit is the exact integer dot product turned
    * double by one division (units 1e-7 · 1e-6 = 1e-13). */
  def withP(feats: DataFrame, xsCols: Seq[String], w: Seq[Long]): DataFrame = {
    val zInt = xsCols.zip(w).map { case (c, wi) => col(c) * lit(wi) }
      .reduce(_ + _)
    val z = zInt.cast("double") / lit(1e13)
    feats.withColumn("p",
      flCol(lit(1e7) / (lit(1.0) + exp(-z))))
  }

  /** One gradient step's aggregation as a 1-row frame (exposed for the
    * plan pin): per feature the exact integer sum Σ residual·xs in
    * DECIMAL(38,0), plus the pass size and correct count. */
  def gradientFrame(pass: DataFrame, xsCols: Seq[String],
                    labelCol: String): DataFrame = {
    val resid = col("p") - col(labelCol) * lit(wScale)
    val aggs = xsCols.map(c =>
      sum((resid * col(c)).cast("decimal(38,0)")).as(s"g_$c")) ++ Seq(
      count(lit(1)).as("n"),
      sum(when((col("p") >= lit(wScale / 2)) === (col(labelCol) === 1), 1L)
        .otherwise(0L)).as("nc"))
    pass.agg(aggs.head, aggs.tail: _*)
  }

  /** Train from w = 0 with `iters` full-batch steps at learning rate
    * `lr`: w_j ← w_j − floor(lr · (G_j/n/1e13 + λ·w_j/1e7) · 1e7 + .5)
    * — the λw term is L2 regularization (weight decay) on the same
    * 1e-7 grid as everything else: one more literal in the update, so
    * the oracle's unrolled replay stays bit-exact. The BIAS (xsCols
    * head) is exempt, the standard convention — penalizing the
    * intercept would pull the decision boundary toward the origin of
    * the label distribution rather than shrink feature reliance. One
    * aggregation job per iteration over the (pre-staged) feature frame.
    * @return every step, final weights last */
  def train(feats: DataFrame, xsCols: Seq[String], labelCol: String,
            lr: Double, iters: Int, l2: Double = 0.0): Seq[Step] = {
    var w = Seq.fill(xsCols.size)(0L)
    (1 to iters).map { t =>
      val r = gradientFrame(withP(feats, xsCols, w), xsCols, labelCol).head()
      val n = r.getLong(xsCols.size)
      val nc = r.getLong(xsCols.size + 1)
      w = w.zipWithIndex.map { case (wi, j) =>
        val g = r.getDecimal(j).doubleValue / n.toDouble / 1e13
        // j == 0 is the bias; x + 0.0 is the identity on every finite
        // double here, so one code path matches both oracle forms
        val pen = if (j == 0) 0.0 else l2 * (wi.toDouble / 1e7)
        wi - fl(lr * (g + pen) * wScale.toDouble)
      }
      Step(t, w, nc)
    }
  }

  /** Per-feature importance off a trained model: |w_j| · σ(xs_j), the
    * realized spread of the (standardized, integer-grid) feature times
    * the weight magnitude — the standard linear-model attribution. All
    * integer arithmetic: σ comes from [[stats]] on the xs columns
    * (1e-6 grid), the product is exact in a LONG (|w| ≤ ~1e8 · σ ≤
    * ~1e7), one division at emission. The caller's frame is the
    * TRAINING frame — importance is an attribution on what the model
    * saw. @return (feature, w_units, sd_units, importance) rows in
    * xsCols order, importance at 6 dp */
  def importance(feats: DataFrame, xsCols: Seq[String], w: Seq[Long],
                 names: Seq[String]): Seq[(String, Long, Long, Double)] = {
    val (_, _, sd) = stats(feats, xsCols)
    names.lazyZip(w).lazyZip(sd).map { (nm, wi, s) =>
      val units = math.abs(wi) * s
      (nm, wi, s, math.floor(units.toDouble / 1e13 * 1e6 + 0.5) / 1e6)
    }.toSeq
  }

  /** Map-only corpus scoring under literal weights: `p_units` (1e-7
    * grid), `score` = p/1e7, `pred` = p ≥ 0.5·1e7. */
  def score(feats: DataFrame, xsCols: Seq[String], w: Seq[Long]): DataFrame =
    withP(feats, xsCols, w)
      .withColumn("p_units", col("p"))
      .withColumn("score", col("p").cast("double") / lit(wScale.toDouble))
      .withColumn("pred", col("p") >= lit(wScale / 2))
      .drop("p")
}
