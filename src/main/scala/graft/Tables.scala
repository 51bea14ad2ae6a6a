package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver testdata layout (TESTDATA.md): one parquet file
  * per table under a scale-factor directory. Explicit single-point of
  * access so partition/caching policy can evolve in one place.
  *
  * At 100 TB these would be date-partitioned directories; a plain
  * `spark.read.parquet(dir)` over a partitioned layout keeps partition
  * pruning available with zero code change here.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: TIMESTAMP(NANOS) — which Spark has no native type
    * for, read as a long (SPARK-40819) and truncated to µs — and
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark infers as
    * TIMESTAMP_NTZ. Both are normalized to a session-TZ TimestampType
    * (sessions here run UTC), which is exactly what DuckDB's
    * µs-precision TIMESTAMP sees when scanning the same file, keeping
    * oracle parity regardless of which encoding the file carries. */
  private def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // Both branches are epoch-correct only under a UTC session (the
    // NTZ→TS cast reads wall time in the session zone); fail loudly
    // rather than silently diverge from the µs-epoch oracle.
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    require(tz == "UTC",
      s"Tables.normalizeTs requires spark.sql.session.timeZone=UTC (got $tz): " +
      "the TIMESTAMP_NTZ cast and the nanos-long path are epoch-sensitive")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }

  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Streaming read of the events table — same ts handling as
    * `events`, as an unbounded frame. The declared schema mirrors
    * whatever the batch reader inferred from the footer (one extra
    * footer read at plan time — negligible). The file source derives
    * basePath from the path and, for a non-glob path, forces basePath =
    * that path (which must be a directory) — so the single-file
    * testdata layout must be passed as a glob: bracket the first
    * character and only this file matches, with the parent directory
    * as base. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema = spark.read.parquet(s"$sfDir/events.parquet").schema
    normalizeTs(
      spark.readStream.schema(fileSchema).parquet(s"$sfDir/[e]vents.parquet"))
  }

  /** Streaming read of the documents table (same bracket-glob trick as
    * `eventsStream`; schema mirrored from the batch footer). The
    * corpus-curation streaming twins treat this as a live ingestion
    * feed. */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    spark.readStream.schema(fileSchema).parquet(s"$sfDir/[d]ocuments.parquet")
  }

  /** Streaming read of the embeddings table (same bracket-glob trick).
    * The ANN serve twin treats this as a live query-vector feed. */
  def embeddingsStream(spark: SparkSession, sfDir: String): DataFrame = {
    val fileSchema = spark.read.parquet(s"$sfDir/embeddings.parquet").schema
    spark.readStream.schema(fileSchema).parquet(s"$sfDir/[e]mbeddings.parquet")
  }

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every testdata table as a temp view so the full ANSI SQL
    * surface works directly: `spark.sql("SELECT ... FROM lineitem")`.
    * The oracle SQL strings in SparkEntry.oracleSql are themselves
    * runnable this way (modulo DuckDB-only list functions). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else table(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
