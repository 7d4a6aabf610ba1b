package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{Funnel, FunnelCore}

/** Property tests for the funnel walk itself (pure — no Spark session):
  * seeded random event streams checked against the independent min-chain
  * definition, hammering exactly the boundary semantics a fixture never
  * hits — steps landing exactly AT the window edge (inclusive), at the
  * previous stage's timestamp (excluded: strictly after), duplicate
  * timestamps, missing stages, and stage events arriving before any
  * view. The same fold is the streaming operator's sealed core AND its
  * provisional snapshot, so this pins q107's semantics at the unit
  * level too.
  */
class FunnelPropSpec extends AnyFunSuite {

  private val types = Seq("view", "click", "purchase", "error")

  /** Independent earliest-completion model: chained mins over windows. */
  private def model(evs: Seq[(Long, String)], w: Long)
      : (Option[Long], Option[Long], Option[Long]) = {
    def firstOf(tp: String, after: Option[Long]): Option[Long] = after.flatMap { t =>
      val in = evs.filter(e => e._2 == tp && e._1 > t && e._1 <= t + w).map(_._1)
      if (in.isEmpty) None else Some(in.min)
    }
    val views = evs.filter(_._2 == "view").map(_._1)
    val t1 = if (views.isEmpty) None else Some(views.min)
    val t2 = firstOf("click", t1)
    val t3 = firstOf("purchase", t2)
    (t1, t2, t3)
  }

  private def walk(evs: Seq[(Long, String)], w: Long) = {
    val c = Funnel.fold(FunnelCore(None, None, None),
      evs.sortBy(e => (e._1, e._2)), w)
    (c.t1, c.t2, c.t3)
  }

  test("the sorted walk equals the min-chain model on 300 seeded streams") {
    val rnd = new Random(4242)
    for (i <- 1 to 300) {
      val w = 1 + rnd.nextInt(12)
      val n = rnd.nextInt(14)
      // tiny timestamp range forces duplicate ts and window-edge hits
      val evs = Seq.fill(n)(
        ((1 + rnd.nextInt(3 * w)).toLong, types(rnd.nextInt(types.length))))
      assert(walk(evs, w) === model(evs, w), s"iteration $i: w=$w evs=$evs")
    }
  }

  test("boundary semantics: window edge inclusive, same-instant excluded") {
    val w = 10L
    // click exactly at t1 + w: INSIDE the window
    assert(walk(Seq((5L, "view"), (15L, "click")), w) ===
      ((Some(5L), Some(15L), None)))
    // click at t1 + w + 1: outside
    assert(walk(Seq((5L, "view"), (16L, "click")), w) ===
      ((Some(5L), None, None)))
    // click at the view's own instant: strictly-after excludes it
    assert(walk(Seq((5L, "view"), (5L, "click")), w) ===
      ((Some(5L), None, None)))
    // purchase before any view never counts, even inside a later window
    assert(walk(Seq((3L, "purchase"), (5L, "view"), (6L, "click"),
      (7L, "purchase")), w) === ((Some(5L), Some(6L), Some(7L))))
  }
}
