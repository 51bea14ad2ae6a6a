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
    // GRAFT_LOF_SLICE=events: coverage + agreement probe for the
    // full events feature slice (the ml_lof upgrade investigation)
    if (sys.env.get("GRAFT_LOF_SLICE").contains("events")) {
      val (_, feats) = ml.Features.preprocessedEvents(spark, d)
      val fe = feats.select(col("event_id").as("vec_id"),
        col("features").cast("array<double>").as("f"))
      val n = fe.count()
      Seq(60, 25).foreach { target =>
        val radius = t("radius")(ml.Lof.estimateRadius(fe, "vec_id", "f", target, n))
        System.err.println(s"[lof] events n=$n target=$target radius=$radius")
        for (proj <- Seq(2, 3); cap <- Seq(128, 512)) {
          val edges = ml.Lof.lshNeighbors(fe, "vec_id", "f", 20, radius,
            projections = proj, bucketCap = cap)
          val (cov, ecnt) = t(s"target=$target proj=$proj cap=$cap edges") {
            val e = edges.localCheckpoint()
            (e.select("id").distinct().count(), e.count())
          }
          System.err.println(s"[lof] target=$target proj=$proj cap=$cap coverage=$cov/$n edges=$ecnt")
        }
      }
      spark.stop(); return
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
