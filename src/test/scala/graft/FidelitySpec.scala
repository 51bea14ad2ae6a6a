package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sources

/** Fidelity against the reference's REAL training fixture
  * (`data/train_transactions.csv`, profiled in SURVEY §1.3): the CSV
  * embeds anomaly labels by construction — 46,000 organic rows
  * (amount ≤ 1000) plus 1,500 injected anomalies reusing ids
  * 9000–10499 with round amounts {5000, 10000, 20000, 50000}, odd-hour
  * timestamps and non-whitelisted locations. These tests run the full
  * pipeline over that file and assert the reference-derived invariants
  * end-to-end. */
class FidelitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val csvPath = "/root/reference/data/train_transactions.csv"

  private lazy val tx = {
    val df = Sources.transactionsCsv(spark, csvPath).cache()
    df.count() // materialize once for the whole suite
    df
  }

  private val injectedAmounts = Set(5000.0, 10000.0, 20000.0, 50000.0)

  test("fixture shape: 47,500 rows, 46,000 distinct ids, 30 customers, 4 merchants") {
    assert(tx.count() == 47500L)
    assert(tx.select("transaction_id").distinct().count() == 46000L)
    assert(tx.select("customer_id").distinct().count() == 30L)
    assert(tx.select("merchant_id").distinct().count() == 4L)
    // timestamps all parse (try_to_timestamp produced no nulls)
    assert(tx.filter(col("timestamp").isNull).count() == 0L)
  }

  test("every amount > 1000 row is an injected anomaly (SURVEY §1.3 label structure)") {
    val injected = tx.filter(col("amount") > 1000.0)
    assert(injected.count() == 1500L)
    val amounts = injected.select("amount").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(amounts.subsetOf(injectedAmounts), s"unexpected amounts: $amounts")
    // timestamps: every 7 minutes starting 2025-05-01T02:00Z (so the
    // 1,500 rows span ~7.3 days and wrap all 24 hours)
    val w = org.apache.spark.sql.expressions.Window.orderBy("timestamp")
    val gapped = injected.withColumn("__prev", lag(col("timestamp"), 1).over(w))
      .withColumn("__is7",
        when(col("__prev") + expr("INTERVAL 7 MINUTES") === col("timestamp"), 1)
          .otherwise(0))
    val Array(tsMin, gaps7) = gapped
      .agg(min("timestamp").cast("string"), sum("__is7").cast("string"))
      .head().toSeq.map(_.asInstanceOf[String]).toArray
    assert(tsMin == "2025-05-01 02:00:00", s"unexpected start: $tsMin")
    assert(gaps7 == "1499", s"expected 1499 consecutive 7-minute gaps, got $gaps7")
    val locs = injected.select("location").distinct()
      .collect().map(_.getString(0)).toSet
    assert(locs == Set("Victoria Falls", "Mutare"), s"unexpected locations: $locs")
  }

  test("latest-per-id dedup: duplicated ids are exactly the reused 9000-10499") {
    val dupIds = tx.groupBy("transaction_id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .select(col("transaction_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    assert(dupIds == (9000L until 10500L).toSet,
      s"expected ids 9000-10499 duplicated, got ${dupIds.size} ids")
  }

  test("rules recall: all 1,500 injected rows trigger large_amount (rule >= 0.6)") {
    val scored = Pipelines.scoreTransactions(tx)
    assert(scored.count() == 47500L)
    val injected = scored.filter(col("amount") > 1000.0)
    assert(injected.filter(col("rule_score") < 0.6).count() == 0L)
    // the rule weights cap at 1.0 and stay within [0, 1] everywhere
    assert(scored.filter(col("rule_score") < 0.0 || col("rule_score") > 1.0).count() == 0L)
  }

  test("amount >= 10000 floors aggregated_score at 0.85 end-to-end (AMOUNT_HIGH_RISK)") {
    val scored = Pipelines.scoreTransactions(tx)
    val floored = scored.filter(col("amount") >= 10000.0)
    assert(floored.count() > 0)
    assert(floored.filter(col("aggregated_score") < 0.85).count() == 0L)
    // and every such row is High risk (0.85 >= 0.7)
    assert(floored.filter(col("risk_level") =!= "High").count() == 0L)
  }

  test("injected rows separate from organic under the full scoring path") {
    val scored = Pipelines.scoreTransactions(tx)
    val Array(injAvg, orgAvg) = scored
      .agg(avg(when(col("amount") > 1000.0, col("aggregated_score"))),
           avg(when(col("amount") <= 1000.0, col("aggregated_score"))))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(injAvg > 2 * orgAvg,
      f"expected clear separation, got injected=$injAvg%.4f organic=$orgAvg%.4f")
  }

  test("full train+score flow on the real CSV ranks injected anomalies top") {
    // reference train flow (train.py) on the reference's own file:
    // feature assembly → preproc fit → iForest/PCA/LOF fits → per-row
    // model risk → GATEWAY fusion (api/app.py:181-193). The fused score
    // is what the reference serves, and on this fixture it must rank
    // the injected rows top: every injected row carries rule ≥ 0.6
    // (base ≥ 0.42 with deviation, override floor 0.5), while organic
    // rows need a near-impossible model_risk ≈ 1 to reach 0.5.
    val feats0 = ml.Features.transactionFeatures(tx)
    val preproc = ml.Preproc.fit(feats0, ml.Features.NumericCols, ml.Features.CatCols)
    val feats = preproc.transform(feats0).cache()
    val cfg = ml.Ensemble.Config()
    val (ifm, pca, aeThr, lof) = ml.Ensemble.fitModels(feats, "transaction_id", cfg)
    val modelRisk = lit(0.4) * operators.Scoring.invSigmoid(ifm.decisionCol(col("features"))) +
      lit(0.3) * operators.Scoring.invSigmoid(lof.scoreCol(col("features")) + lit(1.0)) +
      lit(0.3) * operators.Scoring.normAe(pca.scoreCol(col("features")), lit(aeThr))
    val withMr = feats.withColumn("__model_risk", modelRisk)
      .select("timestamp", "transaction_id", "customer_id", "merchant_id",
              "amount", "channel", "location", "__model_risk")
    val scored = Pipelines.scoreTransactions(withMr, modelRisk = col("__model_risk"))
      .cache()
    val top = scored.orderBy(col("aggregated_score").desc).limit(1500)
    val hits = top.filter(col("amount") > 1000.0).count()
    assert(hits >= 1425L, s"recall@1500 = ${hits / 1500.0}, expected >= 0.95")
    // model risk itself separates in the mean (weak learner, but the
    // signal must point the right way for the fusion weights to help)
    val Array(mrInj, mrOrg) = withMr
      .agg(avg(when(col("amount") > 1000.0, col("__model_risk"))),
           avg(when(col("amount") <= 1000.0, col("__model_risk"))))
      .head().toSeq.map(_.asInstanceOf[Double]).toArray
    assert(mrInj > mrOrg, f"model risk inverted: injected=$mrInj%.4f organic=$mrOrg%.4f")
    feats.unpersist(); scored.unpersist()
  }
}
