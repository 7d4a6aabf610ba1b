package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Principal-component analysis over the embedding corpus — the
  * dimensionality lens of the embedding-analytics family (ref: the
  * reference's embedding feature reports; re-expressed Spark-first).
  *
  * Scale shape: the ONE corpus-sized pass is the moment accumulation —
  * a typed [[Aggregator]] whose buffer is the d·d Gram matrix plus the
  * d-vector sum and the count (d = 64 → 4,161 doubles per task). The
  * aggregation is map-side-combining: every partition reduces its
  * vectors into ONE buffer locally and only buffers cross the wire, so
  * the shuffle is (#partitions × 33 KB) whatever the corpus — the same
  * "summary crosses the shuffle, never the data" discipline as the
  * sketches (llm/Sketches). Everything after the moments is
  * DIMENSION-bounded, not data-bounded: the covariance is derived on
  * the driver (C = G/n − m mᵀ, 64×64) and the dominant eigenvector
  * comes from fixed-count power iteration there — collecting a d·d
  * matrix is the same bounded-scalar collect discipline as k centroids
  * (llm/Kmeans), and iterating on it driver-side is the right
  * engineering: the matrix never grows with the data.
  *
  * Determinism: moments are accumulated in Double (floats widened
  * BEFORE the multiply, matching the oracle's CAST-then-multiply);
  * the iterate starts from the all-ones direction and runs a FIXED
  * iteration count (no convergence test — a data-dependent stop would
  * diverge from the oracle's unrolled replay); the final sign is
  * pinned by the largest-|loading| dimension (first on ties) being
  * positive. Cross-engine float-summation-order differences are
  * contractive under the iteration and vanish at the 6 dp rounding.
  */
object Pca {

  val dim = 64
  val powerIters = 48

  /** Accumulated second/first moments: packed upper-triangle-free full
    * d·d Gram (row-major), the d-vector sum, and the count. */
  case class Moments(g: Array[Double], s: Array[Double], n: Long)

  /** One-pass moment accumulation. Input rows are the raw embedding
    * arrays; the buffer is ONE Moments per task thanks to map-side
    * combine. d·d work per row is the price of any covariance
    * estimate; it runs inside the task loop with zero allocation. */
  final class MomentsAgg extends Aggregator[Array[Float], Moments, Moments] {

    override def zero: Moments =
      Moments(new Array[Double](dim * dim), new Array[Double](dim), 0L)

    override def reduce(b: Moments, v: Array[Float]): Moments = {
      require(v.length == dim, s"embedding dim ${v.length} != $dim")
      var i = 0
      while (i < dim) {
        val xi = v(i).toDouble
        b.s(i) += xi
        var j = 0
        val row = i * dim
        while (j < dim) {
          b.g(row + j) += xi * v(j).toDouble
          j += 1
        }
        i += 1
      }
      Moments(b.g, b.s, b.n + 1)
    }

    override def merge(a: Moments, b: Moments): Moments = {
      var k = 0
      while (k < dim * dim) { a.g(k) += b.g(k); k += 1 }
      var i = 0
      while (i < dim) { a.s(i) += b.s(i); i += 1 }
      Moments(a.g, a.s, a.n + b.n)
    }

    override def finish(r: Moments): Moments = r
    override def bufferEncoder: Encoder[Moments] = ExpressionEncoder()
    override def outputEncoder: Encoder[Moments] = ExpressionEncoder()
  }

  /** The one corpus-sized stage as a 1-row frame: scan → partial agg →
    * final agg, nothing else (plan pinned by PlanSpec). */
  def momentsFrame(emb: DataFrame, vecCol: String): DataFrame = {
    val agg = udaf(new MomentsAgg, ExpressionEncoder[Array[Float]]())
    emb.select(agg(col(vecCol)).as("m"))
  }

  /** Collect the corpus moments of `emb` (one Array[Float] column). */
  def moments(emb: DataFrame, vecCol: String): Moments = {
    val row = momentsFrame(emb, vecCol).head()
    val m = row.getStruct(0)
    Moments(m.getSeq[Double](0).toArray, m.getSeq[Double](1).toArray,
      m.getLong(2))
  }

  /** Driver-side covariance off the moments: C = G/n − m mᵀ.
    * @return (mean, row-major d·d covariance) */
  private def covariance(m: Moments): (Array[Double], Array[Double]) = {
    val n = m.n.toDouble
    val mean = m.s.map(_ / n)
    val c = new Array[Double](dim * dim)
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) {
        c(i * dim + j) = m.g(i * dim + j) / n - mean(i) * mean(j)
        j += 1
      }
      i += 1
    }
    (mean, c)
  }

  /** Fixed-count power iteration from the all-ones direction, sign
    * pinned by the largest-|loading| dimension (first on ties) being
    * positive — the defined statistic the oracle replays. */
  private def dominant(c: Array[Double]): Array[Double] = {
    var v = Array.fill(dim)(1.0 / math.sqrt(dim.toDouble))
    var it = 0
    while (it < powerIters) {
      val w = new Array[Double](dim)
      var a = 0
      while (a < dim) {
        var acc = 0.0
        var b = 0
        while (b < dim) { acc += c(a * dim + b) * v(b); b += 1 }
        w(a) = acc
        a += 1
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
      it += 1
    }
    var best = 0
    var i = 1
    while (i < dim) {
      if (math.abs(v(i)) > math.abs(v(best))) best = i
      i += 1
    }
    if (v(best) < 0) v = v.map(x => -x)
    v
  }

  /** Rayleigh quotient vᵀCv on the final iterate. */
  private def rayleigh(c: Array[Double], v: Array[Double]): Double = {
    var lam = 0.0
    var i = 0
    while (i < dim) {
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += c(i * dim + j) * v(j); j += 1 }
      lam += v(i) * acc
      i += 1
    }
    lam
  }

  private def trace(c: Array[Double]): Double = {
    var tr = 0.0
    var i = 0
    while (i < dim) { tr += c(i * dim + i); i += 1 }
    tr
  }

  /** Driver-side covariance + fixed-count power iteration.
    * @return (mean, loadings (unit, sign-pinned), eigenvalue,
    *         explained-variance ratio = λ / trace C) */
  def principal(m: Moments): (Array[Double], Array[Double], Double, Double) = {
    val (mean, c) = covariance(m)
    val v = dominant(c)
    val lam = rayleigh(c, v)
    (mean, v, lam, lam / trace(c))
  }

  /** Top-k principal components by DEFLATION (Hotelling): extract the
    * dominant eigenvector of C, subtract its rank-1 contribution
    * (C ← C − λ v vᵀ — λ and v the PINNED, final-iterate values, so the
    * oracle's CTE replay deflates the identical matrix), iterate again.
    * All of it is the same dimension-bounded driver arithmetic as the
    * single-component path — the d·d matrix never grows with the data,
    * and the corpus is touched exactly once (the moments pass).
    * Explained-variance ratios are against the ORIGINAL trace, so they
    * sum toward 1 across components.
    * @return (mean, per component: (loadings, eigenvalue, evr)) */
  def principals(m: Moments, k: Int): (Array[Double], Seq[(Array[Double], Double, Double)]) = {
    val (mean, c0) = covariance(m)
    val tr = trace(c0)
    val c = c0.clone()
    val comps = (1 to k).map { _ =>
      val v = dominant(c)
      val lam = rayleigh(c, v)
      var i = 0
      while (i < dim) {
        var j = 0
        while (j < dim) {
          c(i * dim + j) = c(i * dim + j) - lam * v(i) * v(j)
          j += 1
        }
        i += 1
      }
      (v, lam, lam / tr)
    }
    (mean, comps)
  }
}
