package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Batch sources/sinks (SURVEY §2.1).
  *
  * Schemas are always EXPLICIT (never inferred — §1.4): inference reads
  * the data twice and can drift between engines; a declared StructType
  * keeps the scan single-pass and oracle-stable.
  */
object Sources {

  /** The reference's transactions CSV schema
    * (`data/train_transactions.csv:1`). */
  val transactionsCsvSchema: StructType = StructType(Seq(
    StructField("timestamp", StringType),       // parsed below, coerce-style
    StructField("transaction_id", StringType),
    StructField("customer_id", StringType),
    StructField("merchant_id", StringType),
    StructField("amount", DoubleType),
    StructField("channel", StringType),
    StructField("location", StringType)))

  /** `src_csv` (`train.py:34,38`): header CSV with ISO-8601 timestamps
    * parsed `errors='coerce'`-style — unparseable → null (dropped by
    * q_filter_valid downstream), never an exception. PERMISSIVE mode
    * keeps malformed rows as nulls, matching pandas. */
  def transactionsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(transactionsCsvSchema)
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .withColumn("timestamp",
        // try_to_timestamp ≙ pd.to_datetime(errors='coerce'): bad → null
        expr("try_to_timestamp(timestamp)"))

  /** `src_http_batch` (`api/app.py:228-229`): the request-body JSON
    * array becomes a schema'd batch read — one file per POST body in a
    * drop-dir (or a Kafka value stream via ScoreStream). */
  def transactionsJson(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(StructType(
        transactionsCsvSchema.fields.map {
          case f if f.name == "timestamp" => StructField("timestamp", TimestampType)
          case f => f
        }))
      .option("mode", "PERMISSIVE")
      .json(path)

  /** `snk_mysql_log` (`api/app.py:196-219`) re-expressed: the scored
    * batch appends to a date-partitioned parquet log with a sink-side
    * `scored_at` timestamp (the reference's `NOW()` column). ONE write
    * per batch — not the reference's per-row INSERT with a fresh
    * connection each (`python_scoring/app.py:103-111`).
    *
    * Date partitioning is the 100 TB posture: downstream reads of "the
    * last N days of scores" prune partitions instead of scanning the
    * log. */
  def appendScoredLog(scored: DataFrame, tsCol: String, outDir: String): Unit =
    scored
      .withColumn("scored_at", current_timestamp())
      .withColumn("score_date", to_date(col(tsCol)))
      .write.mode("append")
      .partitionBy("score_date")
      .parquet(outDir)

  /** `src_jdbc_profile` in its LIVE-database form (`api/app.py:119-146`
    * reads MySQL): a real `spark.read.jdbc` path for users replaying
    * the reference's deployment against its database instead of the
    * canonical parquet extracts. Any JDBC driver on the classpath
    * works (tests round-trip through embedded Derby).
    *
    * Scale posture: a plain JDBC read is ONE connection pulling the
    * whole table through the driver — pass `partitioning =
    * Some((numericCol, lower, upper, n))` so n executors read n
    * disjoint ranges in parallel. Profile-sized tables (one row per
    * customer) are fine unpartitioned; fact-sized tables never are. */
  def readJdbc(spark: SparkSession, url: String, table: String,
               driver: Option[String] = None,
               partitioning: Option[(String, Long, Long, Int)] = None,
               options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", table).options(options)
    val withDriver = driver.fold(r)(d => r.option("driver", d))
    partitioning.fold(withDriver) { case (c, lo, hi, n) =>
      withDriver.option("partitionColumn", c)
        .option("lowerBound", lo).option("upperBound", hi)
        .option("numPartitions", n)
    }.load()
  }

  /** `snk_mysql_log` in its LIVE-database form (`api/app.py:196-219`
    * INSERTs scores into MySQL): one batched JDBC write per micro-batch
    * or job — never the reference's per-row INSERT with a fresh
    * connection each (`python_scoring/app.py:103-111`). Writes run one
    * connection per partition; coalesce small frames first so a tiny
    * profile write doesn't open 32 connections. */
  def writeJdbc(df: DataFrame, url: String, table: String,
                mode: String = "append", driver: Option[String] = None,
                options: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", url).option("dbtable", table).options(options)
    driver.fold(w)(d => w.option("driver", d)).mode(mode).save()
  }

  /** Write a table bucketed + sorted on its join key (saved through the
    * session catalog — bucketing metadata lives there). Joins and
    * aggregations between two tables bucketed the same way on the same
    * key run with NO exchange: this is the storage-layout half of the
    * 100 TB profile-join story (SURVEY §2.3 — when the customer
    * dimension outgrows broadcast, bucket both sides on customer_id). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
