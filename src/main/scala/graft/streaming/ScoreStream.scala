package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.Pipelines
import graft.operators.Profiles

/** The reference's "real-time" scoring surface as honest Structured
  * Streaming (SURVEY §2.10). The reference serves synchronous HTTP with
  * per-request MySQL profile queries and no event-time semantics
  * (`python_scoring/app.py:239-270`); here:
  *
  *   file/Kafka/memory source → watermark → exactly-once dedup on
  *   transaction id → stream-static broadcast join to the profile →
  *   the SAME batch scoring transform (`Pipelines.applyScoring`) →
  *   foreachBatch parquet append (idempotent by checkpoint).
  *
  * The profile side is a static DataFrame refreshed per restart (the
  * stream-static join re-executes the static plan per micro-batch);
  * a fully stateful variant keeps running {sum,count} per customer in
  * `flatMapGroupsWithState` — see `StatefulProfiles`.
  */
object ScoreStream {

  /** Input schema for streamed events (JSON drop-dir or Kafka value). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming scoring plan over an unbounded events frame:
    * watermark → dropDuplicates(id) within the watermark (the
    * reference's data has non-unique tx ids, SURVEY §1.3) →
    * stream-static profile join → scoring transform. */
  def scored(events: DataFrame, custProfile: DataFrame,
             cfg: Pipelines.EventScoringConfig = Pipelines.EventScoringConfig(),
             watermark: String = "1 day"): DataFrame = {
    val deduped = events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
    Pipelines.applyScoring(
      Profiles.joinProfiles(deduped, custProfile, "user_id"), cfg)
  }

  /** FULL real-time inference (the north-star surface): watermarked,
    * deduped stream scored by the fitted ML ensemble — broadcast
    * models (forest/PCA/LOF-novelty/scaler) + stream-static profile
    * joins, the SAME `Ensemble.scoreBatch` transform as batch. */
  def scoredWithModels(events: DataFrame, fitted: graft.ml.Ensemble.Fitted,
                       watermark: String = "1 day"): DataFrame = {
    val deduped = events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
    graft.ml.Ensemble.scoreBatch(deduped, fitted)
  }

  /** Sliding event-time profile aggregate — the streaming form of the
    * 90-day `WHERE ts >= NOW() - 90 DAY` profile (`api/app.py:126`):
    * watermark-bounded windowed avg/count per customer; late rows
    * beyond the watermark are dropped (counted by the stream metrics),
    * instead of the reference's silent NOW()-relative drift. */
  def windowedProfiles(events: DataFrame, watermark: String = "1 day",
                       window: String = "90 days", slide: String = "1 day"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
               col("user_id"))
      .agg(avg("value").as("cust_avg"), count(lit(1)).as("cust_txn_count"))

  /** Source selection, behind config: a Kafka subscription when
    * `kafka` is set (requires the spark-sql-kafka connector on the
    * classpath), else a JSON drop-dir. Everything downstream of the
    * returned frame is identical — the transforms never know which
    * source fed them. */
  final case class SourceConfig(jsonDir: String = "",
                                kafka: Option[KafkaSource.Config] = None)

  def source(spark: SparkSession, cfg: SourceConfig): DataFrame = cfg.kafka match {
    case Some(k) => KafkaSource.events(KafkaSource.raw(spark, k))
    case None =>
      require(cfg.jsonDir.nonEmpty, "SourceConfig needs jsonDir or kafka")
      spark.readStream.schema(eventSchema).json(cfg.jsonDir)
  }

  /** Idempotent per-batch parquet sink: each micro-batch OVERWRITES
    * its own `batch_id=<id>` partition directory. A batch replayed
    * after a crash in the window between sink write and checkpoint
    * commit re-executes with the SAME batch id over the SAME offsets,
    * so the overwrite lands identical bytes — exactly-once output from
    * an at-least-once engine without a transactional sink (the
    * standard foreachBatch idempotence recipe). Readers see one
    * logical table via partition discovery (`spark.read.parquet(out)`). */
  private def idempotentParquetSink(outDir: String)(batch: DataFrame, id: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$id")

  /** Configured-source → scored → parquet-append runner (the
    * deployable shape: exactly-once via checkpoint + idempotent batch
    * ids). Kafka wiring:
    * `start(spark, SourceConfig(kafka = Some(KafkaSource.Config(
    *   "broker:9092", "events"))), profile, out, ckpt)`.
    *
    * OUTPUT LAYOUT CONTRACT: `outDir` is written as `batch_id=N`
    * partition directories (the idempotence mechanism), so readers see
    * an extra `batch_id` partition column via discovery, and a
    * pre-existing FLAT parquet dir (from an appending sink) must NOT be
    * reused as `outDir` — mixed layouts fail partition discovery. Start
    * new deployments on an empty output directory. */
  def start(spark: SparkSession, src: SourceConfig, custProfile: DataFrame,
            outDir: String, checkpointDir: String): StreamingQuery =
    scored(source(spark, src), custProfile).writeStream
      .foreachBatch(idempotentParquetSink(outDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Line-JSON → typed events: the parse step shared by the socket
    * front door and the file/Kafka JSON paths' parity spec — one
    * transaction per line, the reference's POST body shape
    * (`api/app.py:228-265` takes a JSON transaction per request).
    * Malformed lines and lines missing event_id/ts are dropped here
    * (the front door is a live demo surface; the deployable sources
    * keep corrupt-record adjudication in their own contracts). */
  def parseEventLines(lines: DataFrame): DataFrame =
    lines.select(from_json(col("value"), eventSchema).as("e"))
      .filter(col("e.event_id").isNotNull && col("e.ts").isNotNull)
      .select("e.*")

  /** The network front door (VERDICT r13 #7): the reference's actual
    * product surface is synchronous HTTP scoring; Spark's socket
    * source is the closest thing the engine has to a listening
    * ingress, and the sandbox-provable analogue — a client writes one
    * JSON transaction per line to a TCP endpoint and the SAME
    * watermark→dedup→profile-join→`Pipelines.applyScoring` plan
    * scores it live. Deliberately NOT the deployable path: the socket
    * source is not replayable (no offsets → no exactly-once), which
    * is why it is quarantined to this front-door demo while file and
    * Kafka remain the production sources; a real HTTP termination
    * layer would sit in front of Kafka, not in the Spark driver. */
  def socketSource(spark: SparkSession, host: String, port: Int): DataFrame =
    parseEventLines(spark.readStream.format("socket")
      .option("host", host).option("port", port).load())

  /** socket → scored → idempotent parquet sink: the one-call serving
    * entry a migrating reference user starts instead of uvicorn. */
  def serveSocket(spark: SparkSession, host: String, port: Int,
                  custProfile: DataFrame, outDir: String,
                  checkpointDir: String): StreamingQuery =
    scored(socketSource(spark, host, port), custProfile).writeStream
      .foreachBatch(idempotentParquetSink(outDir) _)
      .option("checkpointLocation", checkpointDir)
      .start()

  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value after. For the FINITE-INPUT
    * streaming twins: their stateful operators pay a fixed per-batch
    * cost per state-store partition (init + commit + offset-log entry),
    * and with one data micro-batch over test-scale input, 32 stores is
    * pure scheduler overhead — the verify/bench twins run 8. Streaming
    * queries pin this conf into the offset-log metadata at query start,
    * so the restore cannot affect a stream already running; shuffle
    * partition COUNT never changes query results, so a concurrent batch
    * plan observing the temporary value stays correct (it may just
    * shuffle into fewer partitions; AQE re-coalesces anyway). At
    * production scale the deployable `start` runners use the session
    * default untouched. */
  private[streaming] def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConfs(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Generalized conf scoping for the finite-input runners. Only confs
    * that can never change query RESULTS belong here (shuffle partition
    * count, adaptive execution on/off): a concurrent batch plan in the
    * same session observing the temporary value stays correct — it may
    * just shuffle differently. The maintained-state runners also turn
    * AQE off: their micro-batches chain dozens of KB-sized stages, and
    * per-stage adaptive re-planning is pure latency at that size (the
    * deployable `start` runners take the session default untouched). */
  private[streaming] def withConfs[T](spark: SparkSession,
                                      kvs: (String, String)*)(body: => T): T = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.get(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  /** Finite-input form for oracle verification of the AS-BUILT
    * streaming scoring path: the events parquet streamed through
    * `scored` (watermark → within-watermark dedup → stream-static
    * profile join → the shared scoring transform), returned as a batch
    * frame. Event ids are unique in the driver testdata, so the dedup
    * is a semantic no-op and the closed-form oracle is the batch
    * flagship query itself — the driver-gated proof that the streaming
    * twin computes the batch answer row for row. */
  def scoredOverFile(spark: SparkSession, sfDir: String,
                     cfg: Pipelines.EventScoringConfig =
                       Pipelines.EventScoringConfig()): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
    val prof = ev.groupBy("user_id").agg(avg("value").as("cust_avg"))
    val name = s"__graft_scored_${runSeq.incrementAndGet()}"
    withShufflePartitions(spark, 8) {
      val q = scored(graft.Tables.eventsStream(spark, sfDir), prof, cfg)
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
  }

  /** File-source convenience form of `start`. `maxFilesPerTrigger`
    * bounds micro-batch size (and gives kill/restart tests a
    * deterministic batch structure). */
  def start(spark: SparkSession, inputDir: String, custProfile: DataFrame,
            outDir: String, checkpointDir: String,
            maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(eventSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    val events = reader.json(inputDir)
    scored(events, custProfile).writeStream
      .foreachBatch(idempotentParquetSink(outDir) _)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
