package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off stage timing for ml_lof (perf investigation; not a driver
  * entry point). Times each sequential job of the query separately so
  * the expensive stage is attributable. */
object ProbeLof {
  def main(a: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[lof] $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm the JVM/codegen once
    Tables.embeddings(spark, d).count()
    (1 to 2).foreach { round =>
      System.err.println(s"[lof] --- round $round ---")
      val emb = t("cast")(Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("f")))
      val n = t("count")(emb.count())
      val radius = t("radius")(ml.Lof.estimateRadius(emb, "vec_id", "f", 60, n))
      val edges = ml.Lof.lshNeighbors(emb, "vec_id", "f", 20, radius)
      val ecnt = t("edges+topk")(edges.count())
      System.err.println(s"[lof] n=$n radius=$radius edges=$ecnt")
      val lof = ml.Lof.fromNeighbors(edges)
      t("fromNeighbors")(lof.count())
      t("full-query")(Queries.all.find(_.name == "ml_lof").get.run(spark, d).count())
    }
    spark.stop()
  }
}
