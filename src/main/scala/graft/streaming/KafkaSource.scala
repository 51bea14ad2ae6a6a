package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka ingestion wiring for the streaming surface (SURVEY §2.10's
  * "file source or Kafka"). The scoring/curation TRANSFORMS
  * (`ScoreStream.scored`, `CorpusStream.cleaned`, …) are
  * source-agnostic; this module contributes only (a) the
  * `format("kafka")` reader and (b) the value-payload parsers that turn
  * Kafka's fixed wire schema into the typed frames those transforms
  * consume.
  *
  * The parsers take ANY frame with Kafka's record schema, so tests
  * drive them from a `MemoryStream[KafkaRecord]` — byte-identical
  * payloads, no broker needed — and the deployable path only swaps the
  * frame's origin to `raw(...)`. Scale shape: parsing is scan-side
  * (`from_json` per record, zero state, zero shuffle); throughput is
  * bounded by `maxOffsetsPerTrigger` (backpressure) × source
  * parallelism = one Spark task per Kafka topic-partition.
  */
object KafkaSource {

  /** Kafka connection/consumption knobs. `maxOffsetsPerTrigger` is the
    * backpressure bound: each micro-batch reads at most this many
    * records across all partitions, keeping batch duration (and
    * therefore watermark lag) stable under producer bursts. */
  final case class Config(
      bootstrapServers: String,
      topics: String,                       // comma-separated subscribe list
      startingOffsets: String = "earliest", // or "latest" / per-partition JSON
      maxOffsetsPerTrigger: Long = 1000000L,
      failOnDataLoss: Boolean = true)

  /** The record schema `format("kafka")` produces — the contract the
    * parsers below (and the test MemoryStream) rely on. */
  val recordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType), StructField("value", BinaryType),
    StructField("topic", StringType), StructField("partition", IntegerType),
    StructField("offset", LongType), StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** Case-class twin of `recordSchema` for MemoryStream-driven tests
    * (`MemoryStream[KafkaRecord].toDF` yields exactly the wire frame). */
  final case class KafkaRecord(key: Array[Byte], value: Array[Byte],
                               topic: String, partition: Int, offset: Long,
                               timestamp: java.sql.Timestamp, timestampType: Int)

  /** The deployable reader: an unbounded frame of `recordSchema` rows.
    * Requires the `spark-sql-kafka-0-10` connector on the classpath
    * (not bundled in this container, so no test starts this — the
    * parse+transform chain downstream of it is what the tests pin). */
  def raw(spark: SparkSession, cfg: Config): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", cfg.bootstrapServers)
      .option("subscribe", cfg.topics)
      .option("startingOffsets", cfg.startingOffsets)
      .option("maxOffsetsPerTrigger", cfg.maxOffsetsPerTrigger)
      .option("failOnDataLoss", cfg.failOnDataLoss)
      .load()

  private def requireKafkaShape(records: DataFrame): Unit = {
    val missing = recordSchema.fieldNames.toSet.diff(records.columns.toSet)
    require(missing.isEmpty, s"not a Kafka record frame; missing: $missing")
  }

  /** Kafka records → the `ScoreStream.eventSchema` events frame.
    * JSON value payloads; rows that fail to parse surface with null
    * `event_id` (from_json's permissive mode) and are quarantined by
    * the same `q_validate` gate as batch, not silently dropped here. */
  def events(records: DataFrame): DataFrame = {
    requireKafkaShape(records)
    records.select(
        from_json(col("value").cast("string"), ScoreStream.eventSchema).as("e"),
        col("timestamp").as("__ingest_ts"))
      .select(col("e.event_id"), col("e.ts"), col("e.user_id"),
              col("e.event_type"), col("e.value"), col("e.props"),
              col("__ingest_ts"))
      // event-time ts missing from the payload → fall back to the
      // broker ingest timestamp so watermarking still has a clock.
      .withColumn("ts", coalesce(col("ts"), col("__ingest_ts")))
      .drop("__ingest_ts")
  }

  /** Kafka records → the documents frame the corpus-curation
    * transforms consume (`doc_id`, `ts`, `text`, `source`, `lang`). */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("ts", TimestampType),
    StructField("text", StringType), StructField("source", StringType),
    StructField("lang", StringType)))

  def documents(records: DataFrame): DataFrame = {
    requireKafkaShape(records)
    records.select(
        from_json(col("value").cast("string"), docSchema).as("d"),
        col("timestamp").as("__ingest_ts"))
      .select(col("d.doc_id"), col("d.ts"), col("d.text"),
              col("d.source"), col("d.lang"), col("__ingest_ts"))
      .withColumn("ts", coalesce(col("ts"), col("__ingest_ts")))
      .drop("__ingest_ts")
  }
}
