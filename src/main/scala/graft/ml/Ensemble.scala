package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Scoring

/** End-to-end ensemble scoring — the reference's full `/score` path
  * (`python_scoring/app.py:239-270` + gateway fusion `api/app.py:
  * 181-193`), split train/serve exactly like the reference:
  *
  *   fit:   preproc fit → 80/20 split (seed 42, `train.py:83`) →
  *          iForest + PCA-recon (AE substitute) + LOF-novelty fits →
  *          P97.5 AE threshold — all state constant-size.
  *   score: enrich → features → 3 broadcast-model score columns →
  *          worker normalization (`python_scoring/app.py:188-196`) →
  *          rules + deviation → gateway fusion → risk level.
  *
  * `scoreBatch` is a pure DataFrame transform — the SAME code scores
  * batch tables and Structured Streaming micro-batches
  * (`streaming.ScoreStream.scoredWithModels`). Scoring shuffles
  * nothing; the only exchanges live in the profile aggregates at fit
  * time.
  */
object Ensemble {

  final case class Config(
      nTrees: Int = 200, subsample: Int = 256, contamination: Double = 0.01,
      pcaK: Int = 8, lofK: Int = 20, lofRefPoints: Int = 2000, seed: Long = 42L,
      largeAmount: Double = 100.0, bigAmount: Double = 250.0,
      suspiciousChannel: String = "purchase", propsKeyThreshold: Int = 80)

  /** Everything scoring needs, all broadcast-safe constant-size state
    * plus the two small profile tables (broadcast at join time). */
  final case class Fitted(
      preproc: PreprocModel, ifModel: IForestModel, pca: PcaReconModel,
      aeThreshold: Double, lofNovelty: LofNoveltyModel,
      custProfile: DataFrame, merchProfile: DataFrame, cfg: Config)

  /** The three anomaly models + AE threshold, fit on an already-
    * preprocessed features frame (domain-agnostic — events binding and
    * the reference's transactions CSV share this). Reference fit order
    * (train.py:66-84): iForest and LOF fit on the FULL preprocessed X;
    * the 80/20 split exists only so the AE has a held-out validation
    * set. The AE-substitute PCA therefore fits on train and its P97.5
    * threshold is computed on valid; the other two models see
    * everything. */
  def fitModels(feats: DataFrame, idCol: String, cfg: Config = Config())
      : (IForestModel, PcaReconModel, Double, LofNoveltyModel) = {
    // r15: the three model fits are independent given the features
    // frame, so their actions overlap (guide §2.6) — each fit is a
    // short chain of small driver-blocking jobs (count/subsample
    // collect/percentile), and running them sequentially left the
    // cluster idle between jobs. The frame is materialized ONCE
    // before the fits so concurrent first-use cannot duplicate the
    // upstream preproc compute (persist is a no-op when the caller's
    // frame — the Features memo — is already cached). Seeded fits on
    // a cached frame are order-independent, so results are unchanged.
    val f = feats.persist()
    f.count(): Unit
    var ifModel: IForestModel = null
    var lofNov: LofNoveltyModel = null
    var pca: PcaReconModel = null
    var aeThr: Double = 0.0
    graft.Phases.inParallel(f.sparkSession, "ml:fit")(
      () => ifModel = IsolationForest.fit(f, "features", cfg.nTrees,
        cfg.subsample, cfg.contamination, cfg.seed),
      () => lofNov = Lof.fitNovelty(f, idCol, "features",
        cfg.lofK, cfg.lofRefPoints),
      () => {
        val Array(train, valid) = f.randomSplit(Array(0.8, 0.2), cfg.seed)
        pca = PcaRecon.fit(train, "features", cfg.pcaK)
        aeThr = valid.select(pca.scoreCol(col("features")).as("m"))
          .agg(expr("percentile_approx(m, 0.975, 10000)")).head().getDouble(0)
      })
    (ifModel, pca, aeThr, lofNov)
  }

  /** Fit all models on the events binding (seeded, deterministic). */
  def fit(spark: SparkSession, sfDir: String, cfg: Config = Config()): Fitted = {
    val (preproc, feats) = Features.preprocessedEvents(spark, sfDir)
    val (ifModel, pca, aeThr, lofNov) = fitModels(feats, "event_id", cfg)
    // profile aggs over the memoized enriched frame (feats carries all
    // enrichment columns) — no extra pass over the source
    val custProf = graft.operators.Profiles.customerProfileFull(feats, "user_id", "amount")
    val merchProf = graft.operators.Profiles.merchantProfile(feats, "channel", "amount")
    Fitted(preproc, ifModel, pca, aeThr, lofNov, custProf, merchProf, cfg)
  }

  /** Score a raw events frame (batch OR streaming): requires the
    * events schema (`event_id, ts, user_id, event_type, value,
    * props`). Pure transform — broadcast joins + expression/UDF
    * columns, no aggregation over the scored frame itself. */
  def scoreBatch(events: DataFrame, m: Fitted): DataFrame = {
    val cfg = m.cfg
    val enriched0 = events
      .withColumn("amount", col("value"))
      .withColumn("channel", col("event_type"))
      .withColumn("location",
        concat(lit("zone_"),
               (get_json_object(col("props"), "$.k").cast("int") / lit(25)).cast("int")))
    val enriched = graft.operators.Profiles.joinProfiles(
        graft.operators.TimeFeatures.withTimeFeatures(enriched0, "ts"),
        m.custProfile, "user_id", Some((m.merchProfile, "channel")))
      .withColumn("cust_txn_count", col("cust_txn_count").cast("double"))
    val feats = m.preproc.transform(enriched)

    val r1 = Scoring.ruleLargeAmount(col("amount"), cfg.largeAmount)
    val r2 = when(lower(col("channel")) === cfg.suspiciousChannel &&
                    get_json_object(col("props"), "$.k").cast("int") > cfg.propsKeyThreshold,
                  lit(Scoring.RuleLocationWeight)).otherwise(lit(0.0))
    val r3 = Scoring.ruleOddHour(col("hour"))

    feats
      .withColumn("__if_raw", m.ifModel.decisionCol(col("features")))
      .withColumn("__ae_raw", m.pca.scoreCol(col("features")))
      .withColumn("__lof_raw", m.lofNovelty.scoreCol(col("features")))
      // worker normalization (python_scoring/app.py:188-196): inverse
      // sigmoid for iForest/LOF decisions, threshold clip for AE
      .withColumn("__if", Scoring.invSigmoid(col("__if_raw")))
      .withColumn("__lof_n", Scoring.invSigmoid(col("__lof_raw") + lit(1.0)))
      .withColumn("__ae", Scoring.normAe(col("__ae_raw"), lit(m.aeThreshold)))
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
      .select(
        col("event_id").as("transaction_id"),
        round(col("__if"), 6).as("anomaly_score_iforest"),
        round(col("__lof_n"), 6).as("anomaly_score_lof"),
        round(col("__ae"), 6).as("anomaly_score_ae"),
        round(col("__dev"), 6).as("deviation_score"),
        round(col("__rule"), 6).as("rule_score"),
        round(col("__agg"), 6).as("aggregated_score"),
        Scoring.riskLevel(col("__agg")).as("risk_level"),
        lit("graft-0.1").as("model_version"))
  }

  /** Fit + score the whole table (the `ml_ensemble_score` query). */
  def scoreEvents(spark: SparkSession, sfDir: String,
                  cfg: Config = Config()): DataFrame = {
    val fitted = fit(spark, sfDir, cfg)
    scoreBatch(graft.Tables.events(spark, sfDir), fitted)
      .orderBy("transaction_id")
  }
}
