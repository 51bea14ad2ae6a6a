package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: per-model recall@1500 of the injected anomalies in the
  * reference training CSV. */
object ProbeFidelity {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tx = sources.Sources.transactionsCsv(spark,
      "/root/reference/data/train_transactions.csv").cache()
    val feats0 = ml.Features.transactionFeatures(tx)
    val preproc = ml.Preproc.fit(feats0, ml.Features.NumericCols, ml.Features.CatCols)
    println(s"[probe] dims=${preproc.dim} names=${preproc.featureNames.mkString(",")}")
    preproc.numeric.foreach { case (c, m, s) => println(f"[probe] $c mean=$m%.3f std=$s%.3f") }
    val feats = preproc.transform(feats0).cache()
    val cfg = ml.Ensemble.Config()
    val (ifm, pca, aeThr, lof) = ml.Ensemble.fitModels(feats, "transaction_id", cfg)
    println(s"[probe] aeThr=$aeThr")
    val scored = feats
      .withColumn("if_raw", ifm.decisionCol(col("features")))
      .withColumn("lof_raw", lof.scoreCol(col("features")))
      .withColumn("ae_raw", pca.scoreCol(col("features")))
      .withColumn("s_if", operators.Scoring.invSigmoid(col("if_raw")))
      .withColumn("s_lof", operators.Scoring.invSigmoid(col("lof_raw") + lit(1.0)))
      .withColumn("s_ae", operators.Scoring.normAe(col("ae_raw"), lit(aeThr)))
      .select(col("transaction_id"), col("amount"),
              col("if_raw"), col("lof_raw"), col("ae_raw"),
              col("s_if"), col("s_lof"), col("s_ae"))
      .cache()
    for (c <- Seq("if_raw", "lof_raw", "ae_raw", "s_if", "s_lof", "s_ae")) {
      val asc = if (c == "if_raw" || c == "lof_raw") col(c).asc else col(c).desc
      val hits = scored.orderBy(asc).limit(1500)
        .filter(col("amount") > 1000.0).count()
      println(f"[probe] $c%8s recall@1500 = ${hits / 1500.0}%.3f")
    }
    scored.groupBy(col("amount") > 1000.0).agg(
      avg("if_raw"), avg("lof_raw"), avg("ae_raw"),
      avg("s_if"), avg("s_lof"), avg("s_ae")).show(false)
    spark.stop()
  }
}
