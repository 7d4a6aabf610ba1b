package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{OpenSession, Sessionize}

/** Unit tests for the session merge core — the cross-batch out-of-order
  * cases the streaming harness can't drive deterministically. */
class SessionizeMergeSpec extends AnyFunSuite {

  private val gap = 5L * 60 * 1000
  private def m(units: Seq[OpenSession]) = Sessionize.mergeSessions(units, gap)
  private def at(min: Long) = min * 60 * 1000

  test("a late event far before the open session starts its own session") {
    // open session at 60min; late event at 10min must NOT merge into it
    val out = m(Seq(OpenSession(at(60), at(62), 3), OpenSession(at(10), at(10), 1)))
    assert(out === Seq(OpenSession(at(10), at(10), 1), OpenSession(at(60), at(62), 3)))
  }

  test("a late event just before a session extends its start backwards") {
    val out = m(Seq(OpenSession(at(60), at(62), 3), OpenSession(at(57), at(57), 1)))
    assert(out === Seq(OpenSession(at(57), at(62), 4)))
  }

  test("a late event bridging two sessions merges them into one") {
    val out = m(Seq(
      OpenSession(at(10), at(12), 2),
      OpenSession(at(20), at(22), 2),
      OpenSession(at(16), at(16), 1))) // within gap of 12 and of 20
    assert(out === Seq(OpenSession(at(10), at(22), 5)))
  }

  test("an event inside a session's span merges without moving bounds") {
    val out = m(Seq(OpenSession(at(10), at(20), 4), OpenSession(at(15), at(15), 1)))
    assert(out === Seq(OpenSession(at(10), at(20), 5)))
  }

  test("boundary: a gap of exactly gapMs does NOT merge (session_window rule)") {
    val out = m(Seq(OpenSession(at(10), at(10), 1), OpenSession(at(15), at(15), 1)))
    assert(out.size === 2)
    val merged = m(Seq(OpenSession(at(10), at(10), 1), OpenSession(at(14), at(14), 1)))
    assert(merged.size === 1)
  }
}
