package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Sealed funnel progress: stage timestamps in MICROSECONDS (event time
  * carries micros; java.sql.Timestamp.getTime would truncate to millis
  * and break parity with the batch q107 walk). */
case class FunnelCore(t1: Option[Long], t2: Option[Long], t3: Option[Long])

/** Per-user state: the core folded from watermark-sealed events, plus
  * the raw events still inside the watermark horizon. Bounded: pending
  * spans at most the watermark delay of event time; the core is three
  * longs — regardless of stream history (the 100 TB requirement).
  * `lastUs` is the user's newest event time — the eviction clock.
  *
  * Schema note: adding `lastUs` changed the state-store schema — a
  * checkpoint written by the 3-field version cannot resume on this
  * code (Spark rejects the widened state schema); restart from a fresh
  * checkpoint and replay, as with any stateful-operator schema change. */
case class FunnelProgress(core: FunnelCore, pending: Seq[(Long, String)],
    seen: Long, lastUs: Long = 0L)

/** One provisional funnel snapshot (Update-mode emission). Consumers
  * keep the row with the largest (last_us, rev) per user: `rev` counts
  * events folded within a funnel generation, and `last_us` (the newest
  * contributing event time) makes the key monotone ACROSS generations —
  * after an eviction, a returning user's fresh funnel starts at rev 1
  * but strictly newer last_us (its events must clear the watermark that
  * triggered the eviction), so it correctly supersedes the evicted
  * funnel's final snapshot. Ties in the full key only occur between a
  * final (timeout) snapshot and the provisional one it seals — which
  * carry identical content. */
case class FunnelSnapshot(user_id: Long, t1_us: Option[Long], t2_us: Option[Long],
    t3_us: Option[Long], depth: Int, converted: Boolean, rev: Long, last_us: Long)

/** Real-time funnel tracking — q107's earliest-completion
  * view -> click -> purchase semantics (strictly-after steps, per-step
  * conversion window) as a custom stateful streaming operator
  * (`flatMapGroupsWithState`, the Sessionize tier).
  *
  * Out-of-order safety is the whole design: the funnel walk is
  * ORDER-SENSITIVE (a click must see the earlier view), so events
  * cannot fold on arrival. Instead each user's state holds raw events
  * until the watermark passes them; sealed events fold into the
  * 3-timestamp core in event-time order, exactly the batch walk, and
  * can never be revised (Spark drops later-arriving events below the
  * watermark, so the sealed prefix is complete). Every batch emits a
  * PROVISIONAL snapshot — core plus the still-pending events walked in
  * order — which equals the batch q107 answer over the events seen so
  * far, regardless of arrival order within the watermark
  * (FunnelStreamSpec pins parity under a reversed-arrival ingest).
  */
object Funnel {

  /** The q107 walk over ts-sorted (micros, type) events. */
  private[graft] def fold(core: FunnelCore, evs: Seq[(Long, String)],
                          windowUs: Long): FunnelCore =
    evs.foldLeft(core) { case (c, (ts, tp)) =>
      if (c.t1.isEmpty && tp == "view") c.copy(t1 = Some(ts))
      else if (c.t2.isEmpty && c.t1.exists(t => ts > t && ts <= t + windowUs)
        && tp == "click") c.copy(t2 = Some(ts))
      else if (c.t3.isEmpty && c.t2.exists(t => ts > t && ts <= t + windowUs)
        && tp == "purchase") c.copy(t3 = Some(ts))
      else c
    }

  private def snapshot(uid: Long, c: FunnelCore, rev: Long,
                       lastUs: Long): FunnelSnapshot = {
    val depth =
      if (c.t3.isDefined) 3 else if (c.t2.isDefined) 2
      else if (c.t1.isDefined) 1 else 0
    FunnelSnapshot(uid, c.t1, c.t2, c.t3, depth, c.t3.isDefined, rev, lastUs)
  }

  /** Track funnels over a stream with `user_id`, event-time `ts`, and
    * `event_type` columns. Emits one provisional snapshot per user per
    * micro-batch that touched or timed out the user.
    *
    * @param evictAfterUs event-time eviction horizon: once the watermark
    *   passes a user's newest event by this much, the state times out —
    *   the remaining pending events (all below the watermark by then)
    *   seal into the core, one FINAL snapshot is emitted, and the state
    *   row is removed. Without it state grows with all-time user
    *   cardinality; with it, state holds only users active inside the
    *   horizon (choose horizon ≥ the funnel's total conversion span so
    *   an in-flight funnel is never cut). A later event for an evicted
    *   user starts a FRESH funnel (below-watermark stragglers cannot
    *   resurrect anything — Spark drops them before the operator).
    *   None = keep state forever (the pre-eviction behavior). */
  def track(events: DataFrame, windowUs: Long, watermarkDelay: String,
            evictAfterUs: Option[Long] = None): Dataset[FunnelSnapshot] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf =
      if (evictAfterUs.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      // watermarks require TIMESTAMP; NTZ event time is wall-clock UTC.
      // The watermarked column must survive into the stateful operator
      // (projecting it away detaches the watermark and
      // getCurrentWatermarkMs throws), so micros derive INSIDE the
      // function via Instant — Timestamp.getTime alone would truncate
      // the micros the batch walk compares on.
      .withColumn("ts", col("ts").cast("timestamp"))
      .select(col("user_id").cast("long").as("user_id"), col("ts"),
        col("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelProgress, FunnelSnapshot](
        OutputMode.Update(), timeoutConf) {
        (uid, it, state) =>
          def micros(t: java.sql.Timestamp): Long = {
            val i = t.toInstant
            i.getEpochSecond * 1000000L + i.getNano / 1000L
          }
          if (state.hasTimedOut) {
            // the watermark passed lastUs + horizon, so every pending
            // event (ts ≤ lastUs) is sealed: fold them, emit the final
            // snapshot, drop the row
            val st = state.get
            val core = fold(st.core, st.pending, windowUs)
            state.remove()
            Iterator(snapshot(uid, core, st.seen, st.lastUs))
          } else {
            val st = state.getOption
              .getOrElse(FunnelProgress(FunnelCore(None, None, None), Nil, 0L))
            val incoming = it.map(e => (micros(e._2), e._3)).toSeq
            val pend = (st.pending ++ incoming).sortBy(p => (p._1, p._2))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            val (sealable, stillPending) =
              if (wmUs > 0) pend.partition(_._1 < wmUs) else (Nil, pend)
            val core = fold(st.core, sealable, windowUs)
            val seen = st.seen + incoming.size
            val lastUs = (st.lastUs +: incoming.map(_._1)).max
            evictAfterUs match {
              case Some(h) if wmUs > 0 && lastUs + h <= wmUs =>
                // already beyond the horizon (a batch of old events):
                // everything sealed above — final snapshot, no state row.
                // setTimeoutTimestamp would reject a past timestamp, so
                // evict inline instead of round-tripping through a timeout
                state.remove()
                Iterator(snapshot(uid, core, seen, lastUs))
              case Some(h) =>
                state.update(FunnelProgress(core, stillPending, seen, lastUs))
                state.setTimeoutTimestamp((lastUs + h) / 1000L)
                Iterator(snapshot(uid, fold(core, stillPending, windowUs), seen, lastUs))
              case None =>
                state.update(FunnelProgress(core, stillPending, seen, lastUs))
                Iterator(snapshot(uid, fold(core, stillPending, windowUs), seen, lastUs))
            }
          }
      }
  }
}
