package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Input event for streaming sessionization (mirrors the events table). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)

/** Closed session emitted once the gap (or the watermark) ends it. */
case class SessionOut(user_id: Long, session_id: Long, n_events: Long, start_ms: Long, end_ms: Long)

private case class SessState(sessionId: Long, startMs: Long, lastMs: Long, n: Long)

/** Live gap-based sessionization: the streaming twin of
  * operators.Sessionize. Arbitrary per-user state via
  * flatMapGroupsWithState with an event-time timeout — a session closes
  * either when a later event arrives past the gap, or when the watermark
  * passes lastEvent+gap (so sessions of silent users still flush).
  *
  * Reference: utils.py:586-627 merges fight events within a 30 s window
  * after the fact; this emits the same grouping incrementally. State per
  * key is O(1) (no event buffering), so executor memory is bounded by
  * active-user count — the property that matters at cluster scale.
  */
object EventSessionizer {
  val GapMs: Long = 30L * 60 * 1000

  def sessionize(events: Dataset[SessionEvent]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val longEnc = Encoders.scalaLong
    implicit val stateEnc = Encoders.product[SessState]
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(processUser)
  }

  private def processUser(
      userId: Long,
      events: Iterator[SessionEvent],
      state: GroupState[SessState]
  ): Iterator[SessionOut] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
    if (state.hasTimedOut) {
      val s = state.get
      out += SessionOut(userId, s.sessionId, s.n, s.startMs, s.lastMs)
      state.remove()
    } else {
      // Micro-batches are unordered; sort the (small) per-trigger slice.
      val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      for (e <- sorted) {
        val ms = e.ts.getTime
        cur match {
          case Some(s) if ms - s.lastMs > GapMs =>
            out += SessionOut(userId, s.sessionId, s.n, s.startMs, s.lastMs)
            cur = Some(SessState(s.sessionId + 1, ms, ms, 1))
          case Some(s) =>
            // Late-but-in-watermark events can arrive out of order across
            // micro-batches; widen the interval on BOTH ends so every
            // counted event falls inside [start_ms, end_ms]. Known O(1)-
            // state trade-off vs batch Sessionize: a cross-batch late
            // event lands in the CURRENT session even if batch replay
            // would have opened the session earlier (re-splitting would
            // need the full event buffer).
            cur = Some(s.copy(
              startMs = math.min(s.startMs, ms),
              lastMs = math.max(s.lastMs, ms),
              n = s.n + 1))
          case None =>
            cur = Some(SessState(0, ms, ms, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + GapMs)
      }
    }
    out.iterator
  }
}
