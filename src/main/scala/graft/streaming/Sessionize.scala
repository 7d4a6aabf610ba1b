package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One event of a keyed session stream. */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Open-session state held per user between micro-batches. */
case class OpenSession(startMs: Long, lastMs: Long, count: Long)

/** A session closed either by a gap in the stream or by event-time timeout. */
case class ClosedSession(user_id: Long, session_start: java.sql.Timestamp, cnt: Long)

/** Custom stateful sessionization via `flatMapGroupsWithState`
  * (SURVEY §2.12 / build brief: "KeyValueGroupedDataset
  * .mapGroupsWithState/flatMapGroupsWithState for custom state").
  *
  * `session_window` (q38) covers gap sessions declaratively; this is the
  * escape hatch for session logic the built-in can't express (per-session
  * derived fields, conditional resets, custom merge rules), shown here
  * with the same inactivity-gap semantics so results are comparable to
  * the built-in:
  *
  *  - state per user = the open session (start, last-seen, count) —
  *    bounded: one small record per active key, independent of history;
  *  - a batch's events sort in-function and extend/rotate the session;
  *    sessions closed by a gap emit immediately (Append mode);
  *  - the trailing open session closes when the event-time watermark
  *    passes its gap horizon, or via `EventTimeTimeout` if the key goes
  *    quiet — state is removed either way, so the store cannot grow
  *    unboundedly (the 100 TB requirement for stateful streaming).
  */
object Sessionize {

  /** Gap-sessionize `events` (needs `user_id`, event-time `ts`).
    * Merge rule matches `session_window`: an event extends the session
    * iff it arrives strictly within `gapMs` of the last event. */
  def sessions(events: DataFrame, gapMs: Long, watermarkDelay: String): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // watermarks require TIMESTAMP; NTZ event time is wall-clock UTC
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("user_id").cast("long").as("user_id"), col("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid, it, state) =>
          def close(s: OpenSession): ClosedSession =
            ClosedSession(uid, new java.sql.Timestamp(s.startMs), s.count)
          if (state.hasTimedOut) {
            // key went quiet past the gap horizon: flush the open session
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            val evs = it.toSeq.sortBy(_.ts.getTime)
            val closed = scala.collection.mutable.ListBuffer[ClosedSession]()
            var cur = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case Some(s) if t - s.lastMs < gapMs =>
                  Some(OpenSession(s.startMs, math.max(s.lastMs, t), s.count + 1))
                case Some(s) =>
                  closed += close(s)
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            val wm = state.getCurrentWatermarkMs()
            cur match {
              case Some(s) if wm > 0 && s.lastMs + gapMs < wm =>
                // can never be extended again — close it now
                closed += close(s)
                if (state.exists) state.remove()
              case Some(s) =>
                state.update(s)
                // fire once the watermark passes the gap horizon; the
                // timestamp must stay ahead of the current watermark
                state.setTimeoutTimestamp(math.max(s.lastMs + gapMs, wm + 1))
              case None =>
                if (state.exists) state.remove()
            }
            closed.iterator
          }
      }
  }
}
