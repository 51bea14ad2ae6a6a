package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization — the stream twin of
  * `operators.Temporal.sessionize` (same 30-min-gap semantics, same
  * rollup columns), built on `flatMapGroupsWithState` with event-time
  * timeouts:
  *
  *  - state per user = the one OPEN session (4 scalars — constant per
  *    active user, nothing grows with history);
  *  - a batch's events merge in event-time order; a gap > `gapSeconds`
  *    closes the open session and emits it (Append mode — each closed
  *    session is emitted exactly once);
  *  - the event-time timeout fires when the watermark passes
  *    `session end + gap`: no event can extend the session any more
  *    (any such event would be behind the watermark), so the session
  *    closes and state is removed — idle users carry zero state.
  *
  * Late events behind the watermark are dropped by the watermark
  * operator before they reach the state function — the standard
  * Structured Streaming contract (documented, bounded lateness).
  */
object SessionStream {

  final case class EventIn(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class OpenSession(startUs: Long, endUs: Long, n: Long, total: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
                              n_events: Long, total_value: Double)

  def update(gapSeconds: Long)(key: Long, rows: Iterator[EventIn],
                               state: GroupState[OpenSession]): Iterator[SessionOut] = {
    val gapUs = gapSeconds * 1000000L
    def out(s: OpenSession) = SessionOut(key, s.startUs, s.endUs, s.n,
      math.rint(s.total * 1e6) / 1e6)
    if (state.hasTimedOut) {
      val done = state.getOption.map(out)
      state.remove()
      done.iterator
    } else {
      // batch arrival order is not event-time order: sort this batch
      val evs = rows.toArray.sortBy(e => (e.ts.getTime, e.event_id))
      var open = state.getOption
      val closed = Seq.newBuilder[SessionOut]
      evs.foreach { e =>
        val t = e.ts.getTime * 1000L
        open match {
          case Some(s) if t - s.endUs <= gapUs =>
            open = Some(OpenSession(s.startUs, math.max(s.endUs, t), s.n + 1,
                                    s.total + e.value))
          case Some(s) =>
            closed += out(s)
            open = Some(OpenSession(t, t, 1, e.value))
          case None =>
            open = Some(OpenSession(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close once the watermark proves no extension is possible
        state.setTimeoutTimestamp(s.endUs / 1000L + gapSeconds * 1000L)
      }
      closed.result().iterator
    }
  }

  /** Closed sessions as an Append-mode stream. `watermarkDelay` bounds
    * accepted lateness; sessions close `gapSeconds` after their last
    * event (in event time). */
  def closedSessions(events: Dataset[EventIn], gapSeconds: Long = 1800,
                     watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update(gapSeconds))
  }
}
