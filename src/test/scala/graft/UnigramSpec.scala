package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.llm.Unigram

/** Unigram-LM Viterbi segmentation vs a driver-side sequential DP with
  * the same (score, split) tie-break — the BpePropSpec discipline for
  * the tokenizer family's other half. The distributed operator runs the
  * DP as in-row lambdas against a broadcast inventory map; this spec
  * proves the reformulation on seeded corpora whose small alphabets
  * maximize ambiguous segmentations (exactly where tie-breaks bite). */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook Viterbi: best[i] = max over l of best[i-l] + logp(piece),
    * ties to the larger split point. Returns the piece count. */
  private def model(word: String, inv: Map[String, Double], maxLen: Int): Int = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val ptr = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (i <- 1 to n) {
      var bs = Double.NegativeInfinity
      var bj = -1
      for (l <- 1 to math.min(i, maxLen)) {
        inv.get(word.substring(i - l, i)).foreach { lp =>
          val s = best(i - l) + lp
          val j = i - l
          if (s > bs || (s == bs && j > bj)) { bs = s; bj = j }
        }
      }
      best(i) = bs
      ptr(i) = bj
    }
    var pos = n
    var k = 0
    while (pos > 0) { pos = ptr(pos); k += 1 }
    k
  }

  private def run(words: Map[String, Long], maxLen: Int, topS: Int)
      : (Map[String, Long], Map[String, Double]) = {
    val wh = words.toSeq.toDF("word", "cnt")
    val inv = Unigram.inventory(wh, maxLen, topS)
    val invMap = inv.collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val got = Unigram.segmentCounts(wh, inv, maxLen).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    (got, invMap)
  }

  test("distributed DP equals the sequential Viterbi on 10 seeded corpora") {
    val rnd = new Random(4242)
    for (i <- 1 to 10) {
      val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
      val words = (1 to 4 + rnd.nextInt(8)).map { _ =>
        val len = 1 + rnd.nextInt(10)
        (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.toMap
      val maxLen = 2 + rnd.nextInt(2)
      val topS = 4 + rnd.nextInt(10)
      val (got, invMap) = run(words, maxLen, topS)
      val want = words.keys.map(w => w -> model(w, invMap, maxLen).toLong).toMap
      assert(got === want, s"iteration $i: words=$words maxLen=$maxLen topS=$topS")
    }
  }

  test("single-char coverage keeps every word segmentable; counts are sane") {
    val words = Map("zzzz" -> 1L, "zqzq" -> 1L, "q" -> 1L)
    val (got, _) = run(words, maxLen = 3, topS = 2)
    words.keys.foreach { w =>
      assert(got(w) >= 1 && got(w) <= w.length, s"$w -> ${got(w)}")
    }
  }

  test("a dominant long piece wins over char-by-char segmentation") {
    // "abab" appears heavily: its substrings dominate the inventory and
    // the ML segmentation of "abab"-words uses multi-char pieces
    val words = Map("abab" -> 50L, "ababab" -> 30L, "cd" -> 1L)
    val (got, invMap) = run(words, maxLen = 4, topS = 8)
    assert(invMap.contains("abab"), "the dominant substring must be selected")
    assert(got("abab") === 1L, "one 4-char piece beats four singles")
    val want = words.keys.map(w => w -> model(w, invMap, 4).toLong).toMap
    assert(got === want)
  }

  /** [[model]]'s backtrace, emitting the pieces. */
  private def modelPieces(word: String, inv: Map[String, Double],
                          maxLen: Int): List[String] = {
    val n = word.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val ptr = Array.fill(n + 1)(-1)
    best(0) = 0.0
    for (i <- 1 to n) {
      var bs = Double.NegativeInfinity
      var bj = -1
      for (l <- 1 to math.min(i, maxLen)) {
        inv.get(word.substring(i - l, i)).foreach { lp =>
          val s = best(i - l) + lp
          if (s > bs || (s == bs && (i - l) > bj)) { bs = s; bj = i - l }
        }
      }
      best(i) = bs
      ptr(i) = bj
    }
    var pos = n
    val ps = List.newBuilder[String]
    while (pos > 0) { ps += word.substring(ptr(pos), pos); pos = ptr(pos) }
    ps.result()
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("hard-EM training equals the sequential model on seeded corpora") {
    val rnd = new Random(9090)
    for (i <- 1 to 6) {
      val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
      val words = (1 to 4 + rnd.nextInt(6)).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.toMap
      val (maxLen, topS, iters) = (2 + rnd.nextInt(2), 4 + rnd.nextInt(8), 2)
      val wh = words.toSeq.toDF("word", "cnt")
      // seed from the operator itself (its selection is already pinned
      // by the segmentation tests); EM iterations replayed driver-side
      var inv = Unigram.inventory(wh, maxLen, topS).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      var want: Map[String, (Long, Double)] = Map.empty
      for (_ <- 1 to iters) {
        val use = scala.collection.mutable.Map[String, Long]()
        words.foreach { case (w, c) =>
          modelPieces(w, inv, maxLen)
            .foreach(p => use(p) = use.getOrElse(p, 0L) + c)
        }
        val tot = use.values.sum.toDouble
        inv = use.map { case (p, c) => p -> round6(math.log(c / tot)) }.toMap
        want = use.map { case (p, c) => p -> ((c, inv(p))) }.toMap
      }
      val got = Unigram.emTrain(wh, maxLen, topS, iters).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === want, s"iteration $i: words=$words maxLen=$maxLen topS=$topS")
    }
  }

  test("EM pruning never breaks coverage: every word segments under the trained inventory") {
    val words = Map("ababab" -> 30L, "bababa" -> 20L, "cdcd" -> 5L, "dc" -> 1L)
    val wh = words.toSeq.toDF("word", "cnt")
    val trained = Unigram.emTrain(wh, 4, 10, 2)
    val got = Unigram.segmentCounts(wh, trained, 4).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    words.keys.foreach { w =>
      assert(got(w) >= 1 && got(w) <= w.length,
        s"$w must stay segmentable after pruning, got ${got.get(w)}")
    }
  }

  test("loss-ranked pruning spares the alphabet and lands at the target size") {
    // the full SentencePiece outer loop: prune toward targetS, but the
    // single-char coverage alphabet is NEVER pruned (floor count 1 even
    // when Viterbi stops using a char), so every word keeps a
    // char-by-char fallback no matter which multi-char pieces die
    val words = Map("ababab" -> 30L, "bababa" -> 20L, "cdcd" -> 5L,
      "dc" -> 1L, "xyx" -> 2L, "zz" -> 1L)
    val wh = words.toSeq.toDF("word", "cnt")
    val alphabet = words.keys.flatMap(_.toSeq).map(_.toString).toSet
    val targetS = alphabet.size + 3
    val trained = Unigram.emTrainPruned(wh, 4, 40, targetS, 3, keepFrac = 0.5)
    val pieces = trained.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val singles = pieces.filter(_._1.length == 1).map(_._1).toSet
    assert(singles === alphabet,
      s"every corpus character must survive pruning: $singles vs $alphabet")
    assert(pieces.forall(p => !p._3.isNaN && !p._3.isInfinite),
      "floored alphabet pieces must carry finite log-probs")
    assert(pieces.length <= targetS + 2,
      s"inventory must shrink toward the target: ${pieces.length} vs $targetS")
    // and the pruned inventory still segments everything
    val got = Unigram.segmentCounts(wh, trained, 4).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    words.keys.foreach { w =>
      assert(got(w) >= 1 && got(w) <= w.length,
        s"$w must stay segmentable under the pruned inventory")
    }
  }

  test("soft-EM equals a sequential quantized forward-backward on seeded corpora") {
    // the operator's quantization contract, replayed sequentially:
    // 6 dp α/β, 1e-7 fixed-point log-sum-exp terms, 1e-6 fixed-point
    // expected counts — all order-free (LONG sums), so direct backward
    // here must equal the operator's forward-on-reversed-word bitwise
    def round6(x: Double): Double =
      if (x.isInfinite) x
      else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fixLong(x: Double, scale: Double): Long =
      BigDecimal(x * scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def lse(xs: Seq[Double]): Double =
      if (xs.isEmpty) Double.NegativeInfinity
      else {
        val mx = xs.max
        val s = xs.map(x => fixLong(math.exp(x - mx), 1e7)).sum
        round6(mx + math.log(s / 1e7))
      }
    def alpha(word: String, inv: Map[String, Double], maxLen: Int): Array[Double] = {
      val n = word.length
      val a = Array.fill(n + 1)(Double.NegativeInfinity)
      a(0) = 0.0
      for (i <- 1 to n) a(i) = lse(
        (1 to math.min(i, maxLen)).flatMap { l =>
          inv.get(word.substring(i - l, i))
            .filter(_ => a(i - l) > Double.NegativeInfinity)
            .map(lp => a(i - l) + lp)
        })
      a
    }
    def beta(word: String, inv: Map[String, Double], maxLen: Int): Array[Double] = {
      val n = word.length
      val b = Array.fill(n + 1)(Double.NegativeInfinity)
      b(n) = 0.0
      for (j <- n - 1 to 0 by -1) b(j) = lse(
        (1 to math.min(n - j, maxLen)).flatMap { l =>
          inv.get(word.substring(j, j + l))
            .filter(_ => b(j + l) > Double.NegativeInfinity)
            .map(lp => lp + b(j + l))
        })
      b
    }
    val rnd = new Random(7)
    (1 to 6).foreach { i =>
      val alphabetN = 2 + rnd.nextInt(3)
      val words = (1 to (4 + rnd.nextInt(6))).map { _ =>
        (1 to (2 + rnd.nextInt(6)))
          .map(_ => ('a' + rnd.nextInt(alphabetN)).toChar).mkString
      }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val maxLen = 2 + rnd.nextInt(3)
      val topS = 4 + rnd.nextInt(10)
      val iters = 1 + rnd.nextInt(2)
      val wh = words.toSeq.toDF("word", "cnt")
      var inv = Unigram.inventory(wh, maxLen, topS).collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      var want: Map[String, (Long, Double)] = Map.empty
      for (_ <- 1 to iters) {
        val use = scala.collection.mutable.Map[String, Long]()
        words.foreach { case (w, c) =>
          val a = alpha(w, inv, maxLen)
          val b = beta(w, inv, maxLen)
          val z = a(w.length)
          if (z > Double.NegativeInfinity)
            for (j <- 0 until w.length; l <- 1 to math.min(w.length - j, maxLen)) {
              val p = w.substring(j, j + l)
              inv.get(p).foreach { lp =>
                if (a(j) > Double.NegativeInfinity &&
                    b(j + l) > Double.NegativeInfinity) {
                  val cm = fixLong(c * math.exp(a(j) + lp + b(j + l) - z), 1e6)
                  use(p) = use.getOrElse(p, 0L) + cm
                }
              }
            }
        }
        val kept = use.filter(_._2 > 0)
        val tot = kept.values.sum.toDouble
        inv = kept.map { case (p, c) => p -> round6(math.log(c / tot)) }.toMap
        want = kept.map { case (p, c) => p -> ((c, inv(p))) }.toMap
      }
      val got = Unigram.softEmTrain(wh, maxLen, topS, iters).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got === want,
        s"corpus $i: words=$words maxLen=$maxLen topS=$topS iters=$iters")
    }
  }

  test("sampled segmentation equals the sequential integer-CDF draw") {
    // the subword-regularization sampler: quantized forward DP + an
    // ALL-INTEGER inverse-CDF pick keyed on md5(word|pos) — replayed
    // here sequentially with the same arithmetic, bit for bit
    def round6(x: Double): Double =
      if (x.isInfinite) x
      else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fixLong(x: Double, scale: Double): Long =
      BigDecimal(x * scale).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def lse(xs: Seq[Double]): Double =
      if (xs.isEmpty) Double.NegativeInfinity
      else {
        val mx = xs.max
        round6(mx + math.log(
          xs.map(x => fixLong(math.exp(x - mx), 1e7)).sum / 1e7))
      }
    def alpha(word: String, inv: Map[String, Double], maxLen: Int): Array[Double] = {
      val a = Array.fill(word.length + 1)(Double.NegativeInfinity)
      a(0) = 0.0
      for (i <- 1 to word.length) a(i) = lse(
        (1 to math.min(i, maxLen)).flatMap { l =>
          inv.get(word.substring(i - l, i))
            .filter(_ => a(i - l) > Double.NegativeInfinity)
            .map(lp => a(i - l) + lp)
        })
      a
    }
    def md5u(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      (1 to 8).map(i => ("0123456789abcdef".indexOf(hex(i - 1)).toLong)
        * math.pow(16, 8 - i).toLong).sum
    }
    def sampled(word: String, inv: Map[String, Double], maxLen: Int): Int = {
      val a = alpha(word, inv, maxLen)
      var pos = word.length
      var n = 0
      while (pos > 0) {
        val cands = (1 to math.min(pos, maxLen)).flatMap { l =>
          inv.get(word.substring(pos - l, pos))
            .filter(_ => a(pos - l) > Double.NegativeInfinity)
            .map(lp => (l, fixLong(math.exp(a(pos - l) + lp - a(pos)), 1e7)))
        }
        val tot = cands.map(_._2).sum
        val u = md5u(s"useg|$word|$pos")
        var cum = 0L
        var pick = 0
        cands.foreach { case (l, w) =>
          if (pick == 0) {
            cum += w
            if (cum * 4294967296L > u * tot) pick = l
          }
        }
        pos -= pick
        n += 1
      }
      n
    }
    val rnd = new Random(11)
    (1 to 6).foreach { i =>
      val alphabetN = 2 + rnd.nextInt(3)
      val words = (1 to (4 + rnd.nextInt(8))).map { _ =>
        (1 to (2 + rnd.nextInt(7)))
          .map(_ => ('a' + rnd.nextInt(alphabetN)).toChar).mkString
      }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
      val maxLen = 2 + rnd.nextInt(3)
      val topS = 4 + rnd.nextInt(10)
      val wh = words.toSeq.toDF("word", "cnt")
      val inv = Unigram.inventory(wh, maxLen, topS)
      val invMap = inv.collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      val want = words.keys.map(w => w -> sampled(w, invMap, maxLen).toLong).toMap
      val got = Unigram.sampleSegmentCounts(wh, inv, maxLen).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(got === want, s"corpus $i: words=$words maxLen=$maxLen topS=$topS")
    }
  }

  test("segmentation is deterministic across runs") {
    val words = Map("aab" -> 3L, "abb" -> 2L, "bba" -> 4L)
    val a = run(words, 3, 6)
    val b = run(words, 3, 6)
    assert(a === b)
  }
}
