package graft

import java.sql.Timestamp

import scala.util.Random

import graft.operators.Upsert

/** Property-style tests for the MERGE upsert (SURVEY.md §5.3): seeded
  * random frames, checked against a reference in-memory MERGE model. */
class UpsertPropSpec extends SparkSpec {
  import spark.implicits._

  private type R = (String, Timestamp, Int)

  private def genRows(rnd: Random, n: Int): List[R] =
    List.fill(n)((s"k${rnd.nextInt(9)}", new Timestamp(86400000L * rnd.nextInt(6)), rnd.nextInt(100)))

  // a snapshot has unique pks by construction
  private def dedupByKey(rows: List[R]): List[R] =
    rows.groupBy(_._1).map { case (_, g) => g.maxBy(r => (r._2.getTime, r._3)) }.toList

  /** In-memory model of MERGE: latest-cursor-wins source dedup, update
    * only on cursor change, insert unmatched. */
  private def model(target: List[R], source: List[R]): Set[R] = {
    val srcBest = source.groupBy(_._1).map { case (_, g) => g.maxBy(r => (r._2.getTime, r._3)) }
    val tMap = target.map(r => r._1 -> r).toMap
    val updatedOrKept = tMap.map { case (k, t) =>
      srcBest.find(_._1 == k) match {
        case Some(s) if s._2 != t._2 => s
        case _ => t
      }
    }.toSet
    updatedOrKept ++ srcBest.filterNot(s => tMap.contains(s._1))
  }

  test("upsert matches the MERGE model on 15 seeded random frames") {
    val rnd = new Random(42)
    for (_ <- 1 to 15) {
      val t = dedupByKey(genRows(rnd, 8))
      val s = genRows(rnd, 8)
      val out = Upsert(t.toDF("id", "updated_at", "v"), s.toDF("id", "updated_at", "v"),
        Seq("id"), "updated_at")
        .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getInt(2))).toSet
      val expected = model(t, s)
      // the engine's dup-dedup tiebreak within equal cursors is row_number
      // over cursor only — compare on key+cursor, values may tie-break
      assert(out.map(r => (r._1, r._2)) === expected.map(r => (r._1, r._2)))
      assert(out.map(_._1).size === out.size, "pks must be unique")
    }
  }

  test("upsert is idempotent: upsert(upsert(t,s),s) == upsert(t,s)") {
    val rnd = new Random(7)
    for (_ <- 1 to 15) {
      val t = dedupByKey(genRows(rnd, 8)).toDF("id", "updated_at", "v")
      val s = genRows(rnd, 8).toDF("id", "updated_at", "v")
      val once = Upsert(t, s, Seq("id"), "updated_at")
      val twice = Upsert(once, s, Seq("id"), "updated_at")
      assert(once.collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet ===
        twice.collect().map(r => (r.getString(0), r.getTimestamp(1))).toSet)
    }
  }
}
