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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark has no native
    * type for — read it as a long (SPARK-40819) and truncate to µs,
    * exactly what DuckDB does when scanning the same file (its TIMESTAMP
    * is µs-precision), keeping oracle parity. */
  private def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Streaming read of the events table — same nanos handling as
    * `events`, as an unbounded frame. The file source derives basePath
    * from the path and, for a non-glob path, forces basePath = that
    * path (which must be a directory) — so the single-file testdata
    * layout must be passed as a glob: bracket the first character and
    * only this file matches, with the parent directory as base. */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val nanoSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.readStream.schema(nanoSchema).parquet(s"$sfDir/[e]vents.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
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
