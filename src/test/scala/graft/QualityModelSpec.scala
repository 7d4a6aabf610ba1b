package graft

import org.apache.spark.sql.functions._

import graft.llm.QualityModel

/** Pins the trained quality classifier (llm/QualityModel) — logistic
  * regression by full-batch GD on exact integer grids, the engine's
  * trained-model-as-oracle-row discipline applied to supervised
  * training. The distributed trainer is checked step-for-step against an
  * INDEPENDENT sequential model (a driver-side loop over the collected
  * rows — the UnigramSpec discipline), then for the things a replay
  * can't show: that it actually learns a planted boundary, ignores a
  * planted distractor, and is bitwise deterministic.
  */
class QualityModelSpec extends SparkSpec {

  private def fl(v: Double): Long = math.floor(v + 0.5).toLong

  // planted two-class fixture on the 1e-6 feature grid: y decided by
  // x1 > 0.5 with a margin, x2 pure uniform noise (the distractor)
  private lazy val fixture: Seq[(Long, Long, Long, Long)] = {
    val rng = new scala.util.Random(7)
    (1L to 400L).map { id =>
      val y = id % 2
      val x1 = if (y == 1) 0.6 + rng.nextDouble() * 0.4
               else rng.nextDouble() * 0.4
      val x2 = rng.nextDouble()
      (id, fl(x1 * 1e6), fl(x2 * 1e6), y)
    }
  }

  private def df() = {
    import spark.implicits._
    fixture.toDF("doc_id", "x1", "x2", "y")
  }

  /** The independent sequential model: same grids, same floor(+0.5)
    * contract, plain loops — no Spark involved past the collect. */
  private def sequential(rows: Seq[(Long, Long, Long)], lr: Double,
                         iters: Int): Seq[(Seq[Long], Long)] = {
    val n = rows.size
    def stats(xs: Seq[Long]): (Long, Long) = {
      val s = xs.map(BigInt(_)).sum
      val mu = fl(s.toDouble / n)
      val ssc = xs.map(x => BigInt(x - mu) * BigInt(x - mu)).sum
      (mu, math.max(fl(math.sqrt(ssc.toDouble / n)), 1L))
    }
    val (mu1, sd1) = stats(rows.map(_._1))
    val (mu2, sd2) = stats(rows.map(_._2))
    val feats = rows.map { case (x1, x2, y) =>
      (Seq(1000000L,
        fl(((x1 - mu1) * 1000000L).toDouble / sd1),
        fl(((x2 - mu2) * 1000000L).toDouble / sd2)), y)
    }
    var w = Seq(0L, 0L, 0L)
    (1 to iters).map { _ =>
      var g = Array(BigInt(0), BigInt(0), BigInt(0))
      var nc = 0L
      feats.foreach { case (x, y) =>
        val z = x.lazyZip(w).map((xi, wi) => xi * wi).sum.toDouble / 1e13
        val p = fl(1e7 / (1.0 + math.exp(-z)))
        val r = p - y * 10000000L
        for (j <- 0 until 3) g(j) += BigInt(r) * BigInt(x(j))
        if ((p >= 5000000L) == (y == 1)) nc += 1
      }
      w = w.zipWithIndex.map { case (wi, j) =>
        wi - fl(lr * (g(j).toDouble / n / 1e13) * 1e7)
      }
      (w, nc)
    }
  }

  private def distributed(lr: Double, iters: Int) = {
    val raw = df()
    val (_, mu, sd) = QualityModel.stats(raw, Seq("x1", "x2"))
    val st = QualityModel.standardize(raw, Seq("x1", "x2"), mu, sd)
    QualityModel.train(st, Seq("xs_bias", "xs_x1", "xs_x2"), "y", lr, iters)
  }

  test("distributed training equals the sequential model step for step") {
    val dist = distributed(lr = 2.0, iters = 5)
    val seq = sequential(fixture.map(t => (t._2, t._3, t._4)), 2.0, 5)
    dist.zip(seq).foreach { case (d, (w, nc)) =>
      assert(d.w === w, s"weights diverge at iter ${d.iter}")
      assert(d.nCorrect === nc, s"pass accuracy diverges at iter ${d.iter}")
    }
  }

  test("the planted boundary is learned and the distractor ignored") {
    val steps = distributed(lr = 2.0, iters = 8)
    val first = steps.head.nCorrect
    val last = steps.last.nCorrect
    assert(last > first, s"accuracy did not climb: $first -> $last")
    assert(last >= (fixture.size * 0.95).toLong,
      s"separable data should be ~fully learned, got $last/${fixture.size}")
    val w = steps.last.w
    assert(math.abs(w(2)) * 5 < math.abs(w(1)),
      s"distractor weight ${w(2)} not dominated by signal ${w(1)}")
  }

  test("L2 shrinks the distractor weight and never the other way") {
    val raw = df()
    val (_, mu, sd) = QualityModel.stats(raw, Seq("x1", "x2"))
    val st = QualityModel.standardize(raw, Seq("x1", "x2"), mu, sd)
    val cols = Seq("xs_bias", "xs_x1", "xs_x2")
    val plain = QualityModel.train(st, cols, "y", 2.0, 8).last.w
    val reg = QualityModel.train(st, cols, "y", 2.0, 8, l2 = 0.05).last.w
    // x2 is the distractor: its gradient signal is noise, so decay wins
    assert(math.abs(reg(2)) < math.abs(plain(2)),
      s"L2 did not shrink the distractor: ${plain(2)} -> ${reg(2)}")
    // the total non-bias weight mass shrinks under decay
    val mass = (w: Seq[Long]) => w.drop(1).map(math.abs).sum
    assert(mass(reg) < mass(plain),
      s"L2 did not shrink the boundary: ${mass(plain)} -> ${mass(reg)}")
    // importance attributes the signal feature far above the distractor
    val imp = QualityModel.importance(st, cols, reg,
      Seq("bias", "x1", "x2"))
    val byName = imp.map(r => r._1 -> r._4).toMap
    assert(byName("x1") > byName("x2") * 3,
      s"importance did not separate signal from distractor: $imp")
  }

  test("training is bitwise deterministic across runs") {
    val a = distributed(lr = 2.0, iters = 3).map(s => (s.w, s.nCorrect))
    val b = distributed(lr = 2.0, iters = 3).map(s => (s.w, s.nCorrect))
    assert(a === b)
  }

  test("scoring thresholds at 0.5 on the probability grid") {
    val raw = df()
    val (_, mu, sd) = QualityModel.stats(raw, Seq("x1", "x2"))
    val st = QualityModel.standardize(raw, Seq("x1", "x2"), mu, sd)
    val w = QualityModel.train(st, Seq("xs_bias", "xs_x1", "xs_x2"),
      "y", 2.0, 5).last.w
    val scored = QualityModel.score(st, Seq("xs_bias", "xs_x1", "xs_x2"), w)
      .select("p_units", "score", "pred").collect()
    scored.foreach { r =>
      val p = r.getLong(0)
      assert(r.getBoolean(2) === (p >= 5000000L))
      assert(math.abs(r.getDouble(1) - p.toDouble / 1e7) === 0.0)
    }
  }

  test("the gradient pass is one map-side-combining aggregate — no join") {
    val raw = df()
    val (_, mu, sd) = QualityModel.stats(raw, Seq("x1", "x2"))
    val st = QualityModel.standardize(raw, Seq("x1", "x2"), mu, sd)
    val g = QualityModel.gradientFrame(
      QualityModel.withP(st, Seq("xs_bias", "xs_x1", "xs_x2"),
        Seq(0L, 0L, 0L)),
      Seq("xs_bias", "xs_x1", "xs_x2"), "y")
    g.collect()
    val p = g.queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Window"),
      s"gradient pass must not join or window:\n$p")
    assert(p.contains("partial_"),
      s"gradient sums must have a map-side partial phase:\n$p")
  }
}
