package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorOps
import graft.operators.{TimeFeatures, Validate, Windows}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- VectorOps ------------------------------------------------------

  test("dot / l2Norm / cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 4.0, 4.0))).toDF("a", "b")
    val row = df.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.l2Norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("cos")).head
    assert(row.getDouble(0) == 18.0)
    assert(row.getDouble(1) == 3.0)
    assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0; zero vector yields 0 not NaN") {
    val df = Seq(
      (Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(VectorOps.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(0.0, 0.0))
  }

  test("rowwiseMse: mse([1,2],[3,4]) = 4; meanSquare([3,4]) = 12.5") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("x", "r")
    val row = df.select(
      VectorOps.rowwiseMse(col("x"), col("r")).as("mse"),
      VectorOps.meanSquare(col("r")).as("ms")).head
    assert(row.getDouble(0) == 4.0)
    assert(row.getDouble(1) == 12.5)
  }

  // ---- TimeFeatures ---------------------------------------------------

  test("day_of_week is pandas semantics: Monday=0 (2024-01-01 was a Monday)") {
    val df = Seq(
      Timestamp.valueOf("2024-01-01 03:04:05"),   // Monday
      Timestamp.valueOf("2024-01-07 23:59:59"))   // Sunday
      .toDF("ts")
    val got = TimeFeatures.withTimeFeatures(df, "ts")
      .select("year", "month", "day_of_week", "hour").collect()
    assert(got(0).toSeq == Seq(2024, 1, 0, 3))
    assert(got(1).toSeq == Seq(2024, 1, 6, 23))
  }

  test("missing timestamp defaults features to 0 (api/app.py:156-159)") {
    val df = Seq(Option.empty[Timestamp]).toDF("ts")
    val got = TimeFeatures.withTimeFeatureDefaults(df, "ts")
      .select("year", "month", "day_of_week", "hour").head
    assert(got.toSeq == Seq(0, 0, 0, 0))
  }

  // ---- Validate -------------------------------------------------------

  test("splitValid routes each failure kind to the error channel") {
    val rows = Seq(
      (Option(Timestamp.valueOf("2024-01-01 00:00:00")), Option(10.0), "123"),  // valid
      (None, Option(10.0), "124"),                                              // no ts
      (Option(Timestamp.valueOf("2024-01-01 00:00:00")), None, "125"),          // no amount
      (Option(Timestamp.valueOf("2024-01-01 00:00:00")), Option(-5.0), "126"),  // negative
      (Option(Timestamp.valueOf("2024-01-01 00:00:00")), Option(10.0), "x9"))   // bad id
    val df = rows.toDF("ts", "amount", "id")
    val (valid, errors) = Validate.splitValid(df, "ts", "amount", "id")
    assert(valid.count() == 1)
    val errs = errors.orderBy("transaction_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(errs == Seq(
      ("124", "missing timestamp"), ("125", "missing amount"),
      ("126", "negative amount"), ("x9", "non-numeric id")))
  }

  test("valid + errors partition the batch (row counts add up)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val (valid, errors) = Validate.splitValid(ev, "ts", "value", "event_id")
    assert(valid.count() + errors.count() == ev.count())
  }

  // ---- Windows --------------------------------------------------------

  test("latestPerKey keeps the newest row per key") {
    val df = Seq(
      ("k1", Timestamp.valueOf("2024-01-01 00:00:00"), "old"),
      ("k1", Timestamp.valueOf("2024-01-02 00:00:00"), "new"),
      ("k2", Timestamp.valueOf("2024-01-01 00:00:00"), "only"))
      .toDF("id", "ts", "tag")
    val got = Windows.latestPerKey(df, "id", "ts", "tag")
      .orderBy("id").collect().map(_.getString(2)).toSeq
    assert(got == Seq("new", "only"))
  }

  test("group mean/count transforms preserve row count") {
    val df = Seq(("a", 1.0), ("a", 3.0), ("b", 10.0)).toDF("k", "v")
    val got = Windows.withGroupMean(df, "k", "v", "m")
    assert(got.count() == 3)
    val m = got.filter(col("k") === "a").select("m").head.getDouble(0)
    assert(m == 2.0)
  }

  test("saltedJoin matches a plain join result on skewed keys") {
    import graft.operators.Skew
    // heavily skewed: 900 rows on key "hot", 100 spread
    val big = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k2", "B")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, dim, "k", 8)
      .groupBy("k", "tag").count().orderBy("k", "tag").collect().map(_.toSeq)
    val plain = big.join(dim, Seq("k"), "left")
      .groupBy("k", "tag").count().orderBy("k", "tag").collect().map(_.toSeq)
    assert(salted.toSeq == plain.toSeq)
  }

  test("topK returns exactly k rows in score order") {
    val df = Seq(("a", 1.0), ("b", 5.0), ("c", 3.0), ("d", 5.0)).toDF("id", "s")
    val got = Windows.topK(df, "s", "id", 2).collect().map(_.getString(0)).toSeq
    assert(got == Seq("b", "d"))   // score desc, id asc tiebreak
  }
}
