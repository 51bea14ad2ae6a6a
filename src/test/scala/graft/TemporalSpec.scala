package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Temporal

class TemporalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // ---- sessionization --------------------------------------------------

  test("withSessionId breaks sessions exactly at gaps > gapSeconds") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:29:59"), 2L),  // 1799s  -> same session
      (1L, ts("2024-01-01 10:59:59"), 3L),  // 1800s  -> same (strictly >)
      (1L, ts("2024-01-01 11:30:00"), 4L),  // 1801s  -> break
      (2L, ts("2024-01-01 10:00:00"), 5L))  // other user starts at 1
      .toDF("user_id", "ts", "event_id")
    val got = Temporal.withSessionId(df, "user_id", "ts", "event_id", 1800)
      .select("event_id", "session_id").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 1))
  }

  test("sessionize rollup: counts, bounds and totals per session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, ts("2024-01-01 10:10:00"), 2L, 5.0),
      (1L, ts("2024-01-01 12:00:00"), 3L, 2.5))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Temporal.sessionize(df, "user_id", "ts", "event_id", "value", 1800)
      .orderBy("session_id").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("n_events") == 2 &&
           got(0).getAs[Double]("total_value") == 15.0)
    assert(got(1).getAs[Long]("n_events") == 1 &&
           got(1).getAs[Double]("total_value") == 2.5)
    // bounds are epoch µs of the first/last event
    assert(got(0).getAs[Long]("start_us") == ts("2024-01-01 10:00:00").getTime * 1000)
    assert(got(0).getAs[Long]("end_us") == ts("2024-01-01 10:10:00").getTime * 1000)
  }

  test("session ids are per-user and 1-based in time order") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val s = Temporal.withSessionId(ev, "user_id", "ts", "event_id", 1800)
    val bad = s.groupBy("user_id")
      .agg(min("session_id").as("lo"), countDistinct("session_id").as("n"),
           max("session_id").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(bad == 0, "session ids must be dense 1..n per user")
  }

  // ---- range join ------------------------------------------------------

  test("rangeJoinBinned: inclusive bounds, multi-bin intervals match once") {
    val points = Seq(5L, 10L, 25L, 99L, 100L, 101L).toDF("p")
    val intervals = Seq((1L, 10L, 100L)).toDF("iid", "lo", "hi")  // spans bins 0..10 at bin=10
    val got = Temporal.rangeJoinBinned(points, intervals, "p", "lo", "hi", binSize = 10L)
      .select("p").as[Long].collect().sorted.toSeq
    assert(got == Seq(10L, 25L, 99L, 100L))  // inclusive both ends, exactly once each
  }

  test("rangeJoinBinned agrees with a naive inequality join on real sessions") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val sess = Temporal.sessionize(ev, "user_id", "ts", "event_id", "value", 1800)
      .filter(col("user_id") < 5)
      .select(col("user_id").as("su"), col("session_id").as("sid"),
              col("start_us"), col("end_us"))
    val pts = ev.filter(col("user_id") >= 5).select(unix_micros(col("ts")).as("ts_us"))
    val fast = Temporal.rangeJoinBinned(pts, sess, "ts_us", "start_us", "end_us",
        binSize = 3600L * 1000000L)
      .groupBy("su", "sid").count().as[(Long, Int, Long)].collect().toSet
    val naive = pts.join(sess, col("ts_us").between(col("start_us"), col("end_us")))
      .groupBy("su", "sid").count().as[(Long, Int, Long)].collect().toSet
    assert(fast == naive)
  }

  // ---- as-of join ------------------------------------------------------

  test("joinAsOf matches the latest strictly-prior right row per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 11:00:00"), "b"),
      (1L, ts("2024-01-01 12:00:00"), "c"),
      (2L, ts("2024-01-01 10:30:00"), "d"))
      .toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 200.0),  // == left "b": strictly-prior excludes
      (3L, ts("2024-01-01 00:00:00"), 999.0))  // key with no left rows
      .toDF("k", "rts", "snap")
    val got = Temporal.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("snap"))
      .select("tag", "snap").as[(String, Option[Double])].collect().toMap
    assert(got == Map("a" -> Some(100.0), "b" -> Some(100.0),
                      "c" -> Some(200.0), "d" -> None))
  }

  test("joinAsOf picks the LATEST of several prior right rows, ties deterministic") {
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "x")).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 11:00:00"), 2.0),
      (1L, ts("2024-01-01 11:00:00"), 3.0))  // same ts: struct-max wins
      .toDF("k", "rts", "snap")
    val got = Temporal.joinAsOf(left, right, Seq("k"), "ts", "rts", Seq("snap"))
      .select("snap").as[Double].head()
    assert(got == 3.0)
  }

  test("joinAsOf agrees with a brute-force subquery on real events") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(2000)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts").as("err_ts"))
    val got = Temporal.joinAsOf(ev, errors, Seq("user_id"), "ts", "err_ts", Seq("err_ts"))
      .select("event_id", "err_ts").as[(Long, Option[Timestamp])].collect().toMap
    // brute force: max prior error ts per event via a join + group
    val brute = ev.as("e").join(errors.as("r"),
        col("e.user_id") === col("r.user_id") && col("r.err_ts") < col("e.ts"), "left")
      .groupBy(col("e.event_id")).agg(max(col("r.err_ts")).as("m"))
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(got == brute)
  }
}
