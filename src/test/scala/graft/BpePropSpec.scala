package graft

import scala.util.Random

import graft.llm.Bpe

/** Property tests for BPE training: seeded random corpora checked
  * against a driver-side SEQUENTIAL implementation of the textbook
  * algorithm (greedy left-to-right merge scan, most-frequent pair,
  * lexicographic ties). The distributed operator reformulates the scan
  * as keyed window functions; this spec is the proof that the
  * reformulation equals the sequential semantics on shapes no
  * hand-written fixture enumerates — long repeat runs, palindromic
  * overlaps, merged symbols colliding with raw substrings, and pair
  * exhaustion. All arithmetic is integer/string, so equality is exact.
  */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  /** Textbook sequential BPE: merge counts, best pair, greedy rewrite. */
  private def model(words: Map[String, Long], steps: Int)
      : (List[(Int, String, String, Long)], Map[String, List[String]]) = {
    var vocab: Map[String, List[String]] =
      words.map { case (w, _) => w -> w.map(_.toString).toList }
    val merges = List.newBuilder[(Int, String, String, Long)]
    var done = false
    for (i <- 1 to steps if !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (w, syms) =>
        syms.zip(syms.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + words(w)
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((x, y), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        merges += ((i, x, y, c))
        vocab = vocab.map { case (w, syms) =>
          val out = List.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == x && syms(j + 1) == y) {
              out += x + y; j += 2
            } else { out += syms(j); j += 1 }
          }
          w -> out.result()
        }
      }
    }
    (merges.result(), vocab)
  }

  private def trainDistributed(words: Map[String, Long], steps: Int,
      trainer: (org.apache.spark.sql.DataFrame, Int) =>
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) =
        (df, s) => Bpe.trainDistributed(df, s)) = {
    val (m, v) = trainer(words.toSeq.toDF("word", "cnt"), steps)
    val merges = m.orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toList
    val vocab = v.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    (merges, vocab)
  }

  test("distributed training equals the sequential algorithm on 10 seeded corpora") {
    val rnd = new Random(777)
    for (i <- 1 to 10) {
      // tiny alphabet maximizes repeat runs and overlap shapes
      val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
      val nWords = 3 + rnd.nextInt(8)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.toMap // duplicate words collapse — histogram semantics
      val steps = 1 + rnd.nextInt(4)
      val got = trainDistributed(words, steps)
      val want = model(words, steps)
      assert(got === want, s"iteration $i: words=$words steps=$steps")
    }
  }

  test("incremental-count training equals the sequential algorithm on 10 seeded corpora") {
    // the delta trainer maintains a persisted pair-count table instead
    // of recounting the vocabulary per merge — same output, different
    // plan; prove it against the same sequential model on the same
    // shapes (repeat runs are the dangerous case: a merged run changes
    // MANY counts of its own pair at once, all through the delta path)
    val rnd = new Random(777)
    for (i <- 1 to 10) {
      val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
      val nWords = 3 + rnd.nextInt(8)
      val words = (1 to nWords).map { _ =>
        val len = 1 + rnd.nextInt(8)
        (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(20)).toLong)
      }.toMap
      val steps = 1 + rnd.nextInt(4)
      val got = trainDistributed(words, steps,
        (df, s) => Bpe.trainIncrementalDistributed(df, s))
      val want = model(words, steps)
      assert(got === want, s"iteration $i: words=$words steps=$steps")
    }
  }

  test("driver-resident training (the gated default at bounded vocab) equals the model") {
    // the PUBLIC entries at fixture scale dispatch to the driver loop
    // (histogram far below spark.graft.tokenizer.driverTrainRows); pin
    // BOTH public trainers against the same sequential model on the
    // same seeded shapes the distributed tests above cover
    for (trainer <- Seq[(org.apache.spark.sql.DataFrame, Int) =>
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
        (df, s) => Bpe.train(df, s), (df, s) => Bpe.trainIncremental(df, s))) {
      val rnd = new Random(777)
      for (i <- 1 to 10) {
        val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
        val nWords = 3 + rnd.nextInt(8)
        val words = (1 to nWords).map { _ =>
          val len = 1 + rnd.nextInt(8)
          (List.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
            (1 + rnd.nextInt(20)).toLong)
        }.toMap
        val steps = 1 + rnd.nextInt(4)
        val got = trainDistributed(words, steps, trainer)
        val want = model(words, steps)
        assert(got === want, s"iteration $i: words=$words steps=$steps")
      }
    }
  }

  test("incremental trainer handles pair exhaustion like the full trainer") {
    // both paths: the gated public entry (driver at this scale) and the
    // distributed loop
    for (inc <- Seq[(org.apache.spark.sql.DataFrame, Int) =>
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
        (df, s) => Bpe.trainIncremental(df, s),
        (df, s) => Bpe.trainIncrementalDistributed(df, s))) {
      val (merges, vocab) = trainDistributed(Map("a" -> 5L, "b" -> 3L), 3, inc)
      assert(merges === Nil)
      assert(vocab === Map("a" -> List("a"), "b" -> List("b")))
      val (m2, v2) = trainDistributed(Map("aa" -> 5L, "b" -> 3L), 3, inc)
      assert(m2 === List((1, "a", "a", 5L)))
      assert(v2 === Map("aa" -> List("aa"), "b" -> List("b")))
    }
  }

  test("pair exhaustion stops training and PRESERVES the vocabulary") {
    for (full <- Seq[(org.apache.spark.sql.DataFrame, Int) =>
        (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)](
        (df, s) => Bpe.train(df, s),
        (df, s) => Bpe.trainDistributed(df, s))) {
      // all single-char words: step 1 finds no pairs at all
      val (merges, vocab) = trainDistributed(Map("a" -> 5L, "b" -> 3L), 3, full)
      assert(merges === Nil)
      assert(vocab === Map("a" -> List("a"), "b" -> List("b")))
      // exhaustion mid-way: "aa" collapses on step 1, steps 2-3 are no-ops
      val (m2, v2) = trainDistributed(Map("aa" -> 5L, "b" -> 3L), 3, full)
      assert(m2 === List((1, "a", "a", 5L)))
      assert(v2 === Map("aa" -> List("aa"), "b" -> List("b")))
    }
  }
}
