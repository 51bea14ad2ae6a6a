package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Scoring

/** Hand-computed expectations from the reference formulas
  * (`api/app.py:167-193`, `python_scoring/app.py:188-203`). */
class ScoringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def eval(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head.getDouble(0)

  test("rule score: 1500/card/Gweru/3am = min(0.6+0.3+0.2, 1) = 1.0") {
    val df = Seq((1500.0, "card", "Gweru", 3)).toDF("amount", "channel", "location", "hour")
    val r1 = Scoring.ruleLargeAmount(col("amount"), 1000.0)
    val r2 = Scoring.ruleCardLocation(col("channel"), col("location"), "card", Seq("Harare", "Bulawayo"))
    val r3 = Scoring.ruleOddHour(col("hour"))
    val got = df.select(Scoring.ruleScore(r1, r2, r3).as("r")).head.getDouble(0)
    assert(got == 1.0)
  }

  test("rule components: safe location and daytime hour contribute 0") {
    val df = Seq((500.0, "card", "Harare", 12)).toDF("amount", "channel", "location", "hour")
    val r1 = Scoring.ruleLargeAmount(col("amount"), 1000.0)
    val r2 = Scoring.ruleCardLocation(col("channel"), col("location"), "card", Seq("Harare", "Bulawayo"))
    val r3 = Scoring.ruleOddHour(col("hour"))
    val got = df.select(Scoring.ruleScore(r1, r2, r3).as("r")).head.getDouble(0)
    assert(got == 0.0)
  }

  test("deviation: (200-100)/(100+1e-9) ~ 1.0; zero avg -> 0") {
    val got = eval(Scoring.deviation(lit(200.0), lit(100.0)))
    assert(math.abs(got - 1.0) < 1e-9)
    assert(eval(Scoring.deviation(lit(200.0), lit(0.0))) == 0.0)
  }

  test("gateway fusion: rule=1, dev=1, no floor -> 0.525 Medium") {
    val agg = Scoring.fuseGateway(lit(1.0), lit(0.0), lit(0.0), lit(0.0),
                                  lit(1.0), lit(1500.0), 10000.0)
    val got = eval(agg)
    assert(math.abs(got - 0.525) < 1e-12)
    val risk = Seq(1).toDF("x").select(Scoring.riskLevel(lit(got))).head.getString(0)
    assert(risk == "Medium")
  }

  test("gateway fusion: amount >= 10000 floors score at 0.85 -> High") {
    val agg = Scoring.fuseGateway(lit(1.0), lit(0.0), lit(0.0), lit(0.0),
                                  lit(1.0), lit(20000.0), 10000.0)
    assert(eval(agg) == 0.85)
  }

  test("gateway fusion override: rule>=0.6 && base<0.4 -> 0.5") {
    // rule=0.6, dev=0: base = 0.45*0.6 = 0.27 < 0.4 -> overridden to 0.5
    val agg = Scoring.fuseGateway(lit(0.6), lit(0.0), lit(0.0), lit(0.0),
                                  lit(0.0), lit(500.0), 10000.0)
    assert(eval(agg) == 0.5)
  }

  test("worker fusion: .4*.2+.3*.3+.3*.4+.45*1 = 0.74 (unclipped variant)") {
    val agg = Scoring.fuseWorker(lit(1.0), lit(0.2), lit(0.3), lit(0.4))
    assert(math.abs(eval(agg) - 0.74) < 1e-12)
  }

  test("risk level boundaries: 0.7 High, 0.4 Medium, 0.39 Low") {
    val df = Seq(0.7, 0.4, 0.39).toDF("s")
    val got = df.select(Scoring.riskLevel(col("s"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("High", "Medium", "Low"))
  }

  test("inv-sigmoid: f(center) = 0.5 and monotone decreasing") {
    assert(math.abs(eval(Scoring.invSigmoid(lit(-0.1))) - 0.5) < 1e-12)
    val xs = Seq(-2.0, -1.0, 0.0, 1.0, 2.0).map(x => eval(Scoring.invSigmoid(lit(x))))
    assert(xs == xs.sorted.reverse, s"not decreasing: $xs")
    assert(xs.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("normAe clips to [0,1]") {
    assert(math.abs(eval(Scoring.normAe(lit(5.0), lit(10.0))) - 0.5) < 1e-9)
    assert(eval(Scoring.normAe(lit(20.0), lit(10.0))) == 1.0)
    assert(eval(Scoring.normAe(lit(-1.0), lit(10.0))) == 0.0)
  }

  test("gateway fusion stays in [0,1] over a deterministic sweep") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { _ =>
      (rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble(),
       (rnd.nextDouble() - 0.5) * 20, rnd.nextDouble() * 20000)
    }
    val df = rows.toDF("rule", "i", "l", "a", "dev", "amt")
    val agg = Scoring.fuseGateway(col("rule"), col("i"), col("l"), col("a"),
                                  col("dev"), col("amt"), 10000.0)
    val bad = df.select(agg.as("s")).filter(col("s") < 0.0 || col("s") > 1.0).count()
    assert(bad == 0)
  }
}
