package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{CorpusStream, KafkaSource, ScoreStream}
import graft.streaming.KafkaSource.KafkaRecord

/** The Kafka ingestion path, driven by a `MemoryStream[KafkaRecord]`
  * whose frame is byte-identical to what `format("kafka")` produces
  * (the connector jar isn't in this container, so the reader itself is
  * exercised only down to its option wiring — everything from the
  * record frame onward runs for real here). */
class KafkaSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private var off = 0L
  private def rec(value: String, ingest: Timestamp,
                  topic: String = "events"): KafkaRecord = {
    off += 1
    KafkaRecord(key = null, value = value.getBytes(UTF_8), topic = topic,
      partition = (off % 3).toInt, offset = off, timestamp = ingest,
      timestampType = 0)
  }

  private def eventJson(id: Long, t: String, user: Long, etype: String,
                        v: Double, withTs: Boolean = true): String = {
    val tsField = if (withTs) s""""ts":"$t",""" else ""
    s"""{"event_id":$id,$tsField"user_id":$user,"event_type":"$etype","value":$v,"props":"{\\"k\\":1}"}"""
  }

  test("kafka events parse to the eventSchema frame and score like batch") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[KafkaRecord]
    val profile = Seq((7L, 100.0)).toDF("user_id", "cust_avg")
    val q = ScoreStream.scored(KafkaSource.events(mem.toDF()), profile)
      .writeStream.format("memory").queryName("kafka_scored")
      .outputMode("append").start()
    try {
      mem.addData(
        rec(eventJson(1L, "2024-01-10 03:00:00", 7L, "purchase", 300.0),
            ts("2024-01-10 03:00:01")),
        rec(eventJson(2L, "2024-01-10 10:00:00", 7L, "view", 10.0),
            ts("2024-01-10 10:00:01")),
        rec(eventJson(2L, "2024-01-10 10:00:00", 7L, "view", 10.0), // dup id
            ts("2024-01-10 10:00:02")))
      q.processAllAvailable()
      val out = spark.table("kafka_scored")
      assert(out.count() == 2, "dup event_id must dedup within watermark")
      // parity: the same rows through the BATCH transform
      val batch = Pipelines.applyScoring(
        Seq((1L, ts("2024-01-10 03:00:00"), 7L, "purchase", 300.0, """{"k":1}""", 100.0),
            (2L, ts("2024-01-10 10:00:00"), 7L, "view", 10.0, """{"k":1}""", 100.0))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props", "cust_avg"))
      val s = out.select("event_id", "aggregated_score", "risk_level")
        .as[(Long, Double, String)].collect().toSet
      val b = batch.select("event_id", "aggregated_score", "risk_level")
        .as[(Long, Double, String)].collect().toSet
      assert(s == b, s"stream $s != batch $b")
    } finally q.stop()
  }

  test("payload without event-time falls back to the broker timestamp") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[KafkaRecord]
    val q = KafkaSource.events(mem.toDF()).writeStream
      .format("memory").queryName("kafka_ts_fallback")
      .outputMode("append").start()
    try {
      mem.addData(rec(eventJson(5L, "", 9L, "view", 1.0, withTs = false),
                      ts("2024-02-01 12:00:00")))
      q.processAllAvailable()
      val row = spark.table("kafka_ts_fallback")
        .select("event_id", "ts").as[(Long, Timestamp)].head()
      assert(row == ((5L, ts("2024-02-01 12:00:00"))))
    } finally q.stop()
  }

  test("kafka documents feed the streaming curation transform unchanged") {
    implicit val sc = spark.sqlContext
    val en = "the cat and the dog of the house is going to the market " +
      "for a walk in the park with a friend on a sunny day today"
    def docJson(id: Long, t: String, text: String) =
      s"""{"doc_id":$id,"ts":"$t","text":"$text","source":"s0","lang":"en"}"""
    val mem = MemoryStream[KafkaRecord]
    val q = CorpusStream.cleaned(KafkaSource.documents(mem.toDF()))
      .writeStream.format("memory").queryName("kafka_curated")
      .outputMode("append").start()
    try {
      mem.addData(
        rec(docJson(1L, "2024-01-10 10:00:00", en), ts("2024-01-10 10:00:01"), "docs"),
        rec(docJson(2L, "2024-01-10 10:01:00", "the and of is to"), // fails gate
            ts("2024-01-10 10:01:01"), "docs"),
        rec(docJson(3L, "2024-01-10 10:30:00", en), // exact dup of 1
            ts("2024-01-10 10:30:01"), "docs"))
      q.processAllAvailable()
      val kept = spark.table("kafka_curated").select("doc_id")
        .as[Long].collect().toSet
      assert(kept == Set(1L), s"kept $kept")
    } finally q.stop()
  }

  test("parsers reject frames that are not Kafka-shaped") {
    val notKafka = Seq((1L, "x")).toDF("id", "value")
    val e = intercept[IllegalArgumentException](KafkaSource.events(notKafka))
    assert(e.getMessage.contains("missing"))
  }

  test("raw reader carries the configured subscription options") {
    // No broker/connector in this container: assert the wiring fails at
    // START (missing data source) and not earlier — i.e. the options
    // pass through the builder without validation errors.
    val cfg = KafkaSource.Config("broker:9092", "events,orders",
      startingOffsets = "latest", maxOffsetsPerTrigger = 5000L)
    val e = intercept[Exception](KafkaSource.raw(spark, cfg))
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected missing-connector error, got: ${e.getMessage}")
  }
}
