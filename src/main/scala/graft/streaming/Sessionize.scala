package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Open-session bounds held per user between micro-batches. */
case class OpenSession(startMs: Long, lastMs: Long, count: Long)

/** Per-key session state: every session not yet finalized by the
  * watermark, sorted by start. Bounded: sessions span at most the
  * watermark delay + gap of event time, regardless of stream history. */
case class SessionState(sessions: Seq[OpenSession])

/** A session finalized by the event-time watermark or a key timeout. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp, cnt: Long)

/** Custom stateful sessionization via `flatMapGroupsWithState`
  * (SURVEY §2.12 / build brief: "KeyValueGroupedDataset
  * .mapGroupsWithState/flatMapGroupsWithState for custom state").
  *
  * `session_window` (q38) covers gap sessions declaratively; this is the
  * escape hatch for session logic the built-in can't express, with the
  * same inactivity-gap semantics so results are comparable:
  *
  *  - state per key = ALL sessions still inside the watermark horizon,
  *    not just the newest — so an out-of-order event arriving in a later
  *    micro-batch (but within the watermark) merges into, extends
  *    backwards, bridges, or starts exactly the session it belongs to,
  *    matching what batch `session_window` computes over the same rows;
  *  - a session is emitted (Append mode) only once the watermark passes
  *    its gap horizon — it can never be extended again — or when the key
  *    times out via `EventTimeTimeout`;
  *  - emitted sessions leave state, so the store stays bounded by
  *    arrival rate × (watermark delay + gap), never by history (the
  *    100 TB requirement for stateful streaming).
  */
object Sessionize {

  /** Coalesce session fragments: sort by start, merge any two whose gap
    * is strictly less than `gapMs` (the `session_window` rule). Events
    * enter as 1-count fragments; existing state sessions merge with any
    * fragment that lands inside or bridges them. */
  private[graft] def mergeSessions(units: Seq[OpenSession], gapMs: Long): Seq[OpenSession] =
    units.sortBy(s => (s.startMs, s.lastMs)).foldLeft(List.empty[OpenSession]) {
      case (head :: tail, s) if s.startMs - head.lastMs < gapMs =>
        OpenSession(head.startMs, math.max(head.lastMs, s.lastMs), head.count + s.count) :: tail
      case (acc, s) => s :: acc
    }.reverse

  /** Gap-sessionize `events` (needs `user_id`, event-time `ts`). */
  def sessions(events: DataFrame, gapMs: Long, watermarkDelay: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // watermarks require TIMESTAMP; NTZ event time is wall-clock UTC
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, it, state) =>
          def close(s: OpenSession): ClosedSession =
            ClosedSession(uid, new java.sql.Timestamp(s.startMs), s.count)
          val held = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val units = held ++ it.map { case (_, ts) =>
            val t = ts.getTime; OpenSession(t, t, 1)
          }
          val merged = mergeSessions(units, gapMs)
          val wm = state.getCurrentWatermarkMs()
          // finalized = the watermark has passed the session's gap
          // horizon, so no event Spark will still accept can extend it.
          // The same rule applies on timeout invocations: the timeout is
          // armed at the EARLIEST horizon, so when it fires only the due
          // sessions emit — later ones stay open and the timeout re-arms
          // below (flushing everything on timeout would emit a session
          // the watermark hasn't sealed yet and undercount it).
          val (done, open) =
            if (wm > 0) merged.partition(_.lastMs + gapMs < wm)
            else (Seq.empty[OpenSession], merged)
          if (open.nonEmpty) {
            state.update(SessionState(open))
            state.setTimeoutTimestamp(math.max(open.map(_.lastMs + gapMs).min, wm + 1))
          } else if (state.exists) {
            state.remove()
          }
          done.sortBy(_.startMs).map(close).iterator
      }
  }
}
