package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Pca

/** PCA moment accumulation + power iteration (q132/q133's machinery). */
class PcaSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"
  private def emb: DataFrame = graft.core.Tables.load(spark, sf, "embeddings")

  test("moments are partitioning-invariant (map-side combine is exact enough)") {
    val m1 = Pca.moments(emb.repartition(1), "embedding")
    val m7 = Pca.moments(emb.repartition(7), "embedding")
    assert(m1.n == m7.n)
    // float-sum order differs across partitionings; the principal
    // direction must agree at the oracle's rounding
    val v1 = Pca.principal(m1)._2
    val v7 = Pca.principal(m7)._2
    val maxd = v1.zip(v7).map { case (a, b) => math.abs(a - b) }.max
    assert(maxd < 1e-9, s"partitioning moved loadings by $maxd")
  }

  test("loadings are unit-norm with the sign pinned positive at the peak") {
    val (_, v, lam, evr) = Pca.principal(Pca.moments(emb, "embedding"))
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-12)
    val best = v.indices.maxBy(i => (math.abs(v(i)), -i))
    assert(v(best) > 0, "sign pin violated")
    assert(lam > 0 && evr > 0 && evr <= 1.0)
  }

  test("deflation recovers two planted directions in order, with rank-2 EVR ~ 1") {
    // exactly-rank-2 data: x = a·d1 + b·d2 with deterministic integer
    // coefficient patterns, var(a) > var(b); d1 ⊥ d2, neither axis-aligned
    val d = Pca.dim
    val s2 = math.sqrt(2.0)
    def d1(i: Int) = if (i == 2 || i == 5) 1.0 / s2 else 0.0
    def d2(i: Int) = if (i == 2) 1.0 / s2 else if (i == 5) -1.0 / s2 else 0.0
    val rows = (0 until 210).map { r =>
      val a = (r % 21).toDouble - 10.0   // wide spread
      val b = ((r % 7).toDouble - 3.0) * 0.4 // narrow spread
      Array.tabulate(d)(i => (a * d1(i) + b * d2(i)).toFloat)
    }
    import spark.implicits._
    val m = Pca.moments(rows.toDF("embedding"), "embedding")
    val (_, comps) = Pca.principals(m, 2)
    val (v1, lam1, evr1) = comps(0)
    val (v2, lam2, evr2) = comps(1)
    def dot(v: Array[Double], f: Int => Double) =
      v.indices.map(i => v(i) * f(i)).sum
    assert(math.abs(dot(v1, d1)) > 0.999, "PC1 missed the wide direction")
    assert(math.abs(dot(v2, d2)) > 0.999, "PC2 missed the narrow direction")
    assert(lam1 > lam2 && lam2 > 0, s"eigenvalues not descending: $lam1, $lam2")
    assert(math.abs(evr1 + evr2 - 1.0) < 1e-9,
      s"rank-2 data must be fully explained by 2 PCs: ${evr1 + evr2}")
  }

  test("deflated components are orthogonal, eigenvalues descend, PC1 == principal") {
    val m = Pca.moments(emb, "embedding")
    val (_, comps) = Pca.principals(m, 3)
    val single = Pca.principal(m)._2
    assert(comps(0)._1.sameElements(single),
      "principals' first component must be bit-equal to principal's")
    for (Seq((a, la, _), (b, lb, _)) <- comps.sliding(2)) {
      // descending up to iterate slack: on a near-flat tail spectrum
      // (λ2 ≈ λ3 here) the 48-step iterate's Rayleigh quotient can
      // invert by <1%; exact order is only guaranteed at convergence
      assert(la >= lb * 0.95, s"eigenvalues badly out of order: $la < $lb")
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      // components are the DEFINED 48-step iterates, not exact
      // eigenvectors — on a small eigengap the iterate retains a
      // residual (λnext/λ)^48 of the next direction, so orthogonality
      // is approximate here (the planted-direction test covers the
      // well-separated case at 1e-3)
      assert(math.abs(dot) < 0.05, s"components far from orthogonal: dot=$dot")
    }
  }

  test("projection variance equals the Rayleigh eigenvalue") {
    val m = Pca.moments(emb, "embedding")
    val (mean, v, lam, _) = Pca.principal(m)
    val scores = emb.collect().map { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      e.indices.map(i => (e(i).toDouble - mean(i)) * v(i)).sum
    }
    val mu = scores.sum / scores.length
    val varc = scores.map(s => (s - mu) * (s - mu)).sum / scores.length
    // the iterate's Rayleigh quotient IS the variance captured along it
    assert(math.abs(varc - lam) < 1e-9, s"var $varc vs lambda $lam")
  }
}
