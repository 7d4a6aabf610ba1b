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
