package graft
import org.apache.spark.sql.SparkSession

/** Dev profiler: time (warm + steady) a named subset of the declared
  * queries on SPARK_GRAFT_SF_DIR, optionally printing the formatted
  * physical plan (`SPARK_GRAFT_EXPLAIN=1`). Usage:
  *   sbt "runMain graft.ProfileQueries q_time_features q_tfidf_top_term"
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wanted = if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted else args.toSeq
    wanted.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        println(s"==== $name ====")
        fn(spark, sfDir).explain("formatted")
      }
      val w0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t1 = System.nanoTime()
      println(f"[profile] $name warm=${(t0 - w0) / 1e9}%.2f timed=${(t1 - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
