package graft

import java.sql.Timestamp

import scala.util.Random

import graft.operators.AsOf

/** Property-style tests for the as-of join: seeded random frames checked
  * against a brute-force O(n·m) reference model. */
class AsOfPropSpec extends SparkSpec {
  import spark.implicits._

  private type L = (Long, Timestamp, Int)            // key, ts, left id
  private type R = (Long, Timestamp, Option[String]) // key, ts, nullable payload

  private def ts(rnd: Random): Timestamp = new Timestamp(3600000L * rnd.nextInt(48))

  private def genLeft(rnd: Random, n: Int): List[L] =
    List.fill(n)((rnd.nextInt(4).toLong, ts(rnd), rnd.nextInt(1000)))

  // right side unique per (key, ts) — the operator's documented
  // precondition; ~1 in 4 payloads is null (matched rows must surface
  // their own null, not an older value)
  private def genRight(rnd: Random, n: Int): List[R] =
    List.fill(n)((rnd.nextInt(4).toLong, ts(rnd),
      if (rnd.nextInt(4) == 0) None else Some(s"p${rnd.nextInt(1000)}")))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toList

  /** Brute force: latest right at-or-before each left row. A matched row
    * carrying null and no-match both surface as None — same as the
    * engine output — but a per-column-fill bug would surface an OLDER
    * row's non-null value where the model says None. */
  private def model(left: List[L], right: List[R]): Set[(Int, Option[String])] =
    left.map { l =>
      val best = right.filter(r => r._1 == l._1 && !r._2.after(l._2))
        .sortBy(_._2.getTime).lastOption
      (l._3, best.flatMap(_._3))
    }.toSet

  test("as-of join matches the brute-force model on 15 seeded random frames") {
    val rnd = new Random(2024)
    for (i <- 1 to 15) {
      val l = genLeft(rnd, 12)
      val r = genRight(rnd, 10)
      val out = AsOf.join(
        l.toDF("k", "t", "lid"), r.toDF("rk", "rt", "payload"),
        "k", "rk", "t", "rt", Seq("payload"))
        .collect().map(row => (row.getInt(2), Option(row.getString(3)))).toSet
      assert(out === model(l, r), s"iteration $i: left=$l right=$r")
    }
  }
}
