package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Scoring

/** End-to-end ensemble scoring — the reference's full `/score` path
  * (`python_scoring/app.py:239-270` + gateway fusion `api/app.py:
  * 181-193`) as one Spark job:
  *
  *   preproc fit → 80/20 split (seed 42, `train.py:83`) →
  *   iForest + PCA-recon (AE substitute) + LOF fits →
  *   per-row model scores → worker normalization
  *   (`python_scoring/app.py:188-196`) → rules + deviation →
  *   gateway fusion → risk level.
  *
  * Model state (forest arrays, component matrix, scaler scalars) is
  * broadcast; scoring is one pass over the data. The only shuffles are
  * the profile/LOF aggregates — nothing is ever collected beyond
  * constant-size model state.
  */
object Ensemble {

  final case class Config(
      nTrees: Int = 200, subsample: Int = 256, contamination: Double = 0.01,
      pcaK: Int = 8, lofK: Int = 20, seed: Long = 42L,
      largeAmount: Double = 100.0, bigAmount: Double = 250.0,
      suspiciousChannel: String = "purchase", propsKeyThreshold: Int = 80)

  def scoreEvents(spark: SparkSession, sfDir: String,
                  cfg: Config = Config()): DataFrame = {
    val (_, feats) = Features.preprocessedEvents(spark, sfDir)  // cached by Features

    val Array(train, valid) = feats.randomSplit(Array(0.8, 0.2), cfg.seed)
    val ifModel = IsolationForest.fit(train, "features", cfg.nTrees,
                                      cfg.subsample, cfg.contamination, cfg.seed)
    val pca = PcaRecon.fit(train, "features", cfg.pcaK)
    val aeThr = valid.select(pca.scoreCol(col("features")).as("m"))
      .agg(expr("percentile_approx(m, 0.975, 10000)")).head.getDouble(0)

    val n = feats.count()
    val radius = Lof.estimateRadius(feats, "event_id", "features",
                                    targetPerPoint = cfg.lofK * 3, n = n)
    val lofScores = Lof.fromNeighbors(
        Lof.lshNeighbors(feats, "event_id", "features", cfg.lofK, radius, cfg.seed))
      .select(col("id").as("event_id"), col("lof"))

    val r1 = Scoring.ruleLargeAmount(col("amount"), cfg.largeAmount)
    val r2 = when(lower(col("channel")) === cfg.suspiciousChannel &&
                    get_json_object(col("props"), "$.k").cast("int") > cfg.propsKeyThreshold,
                  lit(Scoring.RuleLocationWeight)).otherwise(lit(0.0))
    val r3 = Scoring.ruleOddHour(col("hour"))

    val scored = feats
      .withColumn("__if_raw", ifModel.decisionCol(col("features")))
      .withColumn("__ae_raw", pca.scoreCol(col("features")))
      .join(lofScores, Seq("event_id"), "left")
      // LSH dropouts (no candidate within radius) score as inliers
      .withColumn("__lof_raw", -coalesce(col("lof"), lit(1.0)))
      // worker normalization (python_scoring/app.py:188-196): inverse
      // sigmoid for iForest/LOF decisions, threshold clip for AE
      .withColumn("__if", Scoring.invSigmoid(col("__if_raw")))
      .withColumn("__lof_n", Scoring.invSigmoid(col("__lof_raw") + lit(1.0)))
      .withColumn("__ae", Scoring.normAe(col("__ae_raw"), lit(aeThr)))
      .withColumn("__rule", Scoring.ruleScore(r1, r2, r3))
      .withColumn("__dev", Scoring.deviation(col("amount"), col("cust_avg_amount")))
      .withColumn("__mr",
        lit(0.4) * col("__if") + lit(0.3) * col("__lof_n") + lit(0.3) * col("__ae"))
      .withColumn("__base",
        lit(0.45) * col("__rule") + lit(0.4) * col("__mr") +
          lit(0.15) * Scoring.clip01(col("__dev") / lit(2.0)))
      .withColumn("__over",
        when(col("__rule") >= 0.6 && col("__base") < 0.4, lit(0.5))
          .otherwise(col("__base")))
      .withColumn("__agg",
        when(col("amount") >= cfg.bigAmount, greatest(col("__over"), lit(0.85)))
          .otherwise(col("__over")))

    scored.select(
        col("event_id").as("transaction_id"),
        round(col("__if"), 6).as("anomaly_score_iforest"),
        round(col("__lof_n"), 6).as("anomaly_score_lof"),
        round(col("__ae"), 6).as("anomaly_score_ae"),
        round(col("__dev"), 6).as("deviation_score"),
        round(col("__rule"), 6).as("rule_score"),
        round(col("__agg"), 6).as("aggregated_score"),
        Scoring.riskLevel(col("__agg")).as("risk_level"),
        lit("graft-0.1").as("model_version"))
      .orderBy("transaction_id")
  }
}
