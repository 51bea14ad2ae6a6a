package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful running customer profiles — the `flatMapGroupsWithState`
  * alternative to re-aggregating profiles per batch (SURVEY §2.10):
  * keeps per-DAY {sum, count} buckets per customer (≤ 91 live buckets,
  * pruned as event time advances) and emits the trailing-90-day profile
  * on every micro-batch — the windowed semantics of
  * `api/app.py:123-128`'s NOW()-relative aggregate, without rescanning
  * history per request. State for a customer idle past the horizon is
  * dropped via an event-time timeout (watermark-driven), so total state
  * is bounded by active customers × 91 scalars.
  */
object StatefulProfiles {

  final case class EventIn(event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  /** day (epoch days) → (sum, count) buckets + latest event millis. */
  final case class ProfState(buckets: Map[Long, (Double, Long)], lastTs: Long)
  final case class ProfOut(user_id: Long, cust_avg: Double, cust_txn_count: Long)

  val HorizonDays = 90
  private val DayMs = 24L * 3600 * 1000
  private val HorizonMs = HorizonDays.toLong * DayMs

  def update(key: Long, rows: Iterator[EventIn],
             state: GroupState[ProfState]): Iterator[ProfOut] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      var s = state.getOption.getOrElse(ProfState(Map.empty, Long.MinValue))
      rows.foreach { e =>
        val t = e.ts.getTime
        val day = math.floorDiv(t, DayMs)
        val (bs, bc) = s.buckets.getOrElse(day, (0.0, 0L))
        s = ProfState(s.buckets.updated(day, (bs + e.value, bc + 1)),
                      math.max(s.lastTs, t))
      }
      // prune buckets that fell out of the trailing window
      val minDay = math.floorDiv(s.lastTs, DayMs) - (HorizonDays - 1)
      s = s.copy(buckets = s.buckets.filter { case (d, _) => d >= minDay })
      state.update(s)
      // whole-customer state expires when event time passes last+90d
      state.setTimeoutTimestamp(s.lastTs + HorizonMs)
      val sum = s.buckets.valuesIterator.map(_._1).sum
      val cnt = s.buckets.valuesIterator.map(_._2).sum
      Iterator.single(ProfOut(key, if (cnt == 0) 0.0 else sum / cnt, cnt))
    }
  }

  /** Streaming Dataset of per-customer trailing-90-day profiles (Update
    * mode). The watermark both bounds late data and drives state expiry. */
  def running(events: Dataset[EventIn],
              watermarkDelay: String = "1 hour"): Dataset[ProfOut] = {
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
