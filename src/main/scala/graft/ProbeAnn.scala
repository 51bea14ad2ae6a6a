package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: sweep IVF-PQ knobs (nprobe × shortlist × ksub) against
  * brute-force cosine on sf0.001, printing recall@10 per config — the
  * tuning harness behind the declared `sim_ivfpq_topk` parameters. */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val exact = SparkEntry.queries("q_sim_bruteforce")(spark, sfDir)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("f"))
      .withColumn("n", sqrt(graft.functions.VectorOps.dot(col("f"), col("f"))))
      .filter(col("n") > 0)
      .withColumn("u", graft.functions.ArrayMath.scale(col("f"), lit(1.0) / col("n")))
      .select(col("vec_id"), col("u"))
    val cent = operators.Ivf.fitCentroids(e, "vec_id", "u", nlist = 16)

    for (ksub <- Seq(16, 32);
         m <- Seq(16, 8);
         nprobe <- Seq(8, 12);
         shortlist <- Seq(50, 100, 200)) {
      val model = operators.Pq.fit(e, "vec_id", "u", m = m, ksub = ksub)
      val t0 = System.nanoTime()
      val r = recallOf(operators.Pq.topkIvfPq(e, "vec_id", "u",
        e.filter(col("vec_id") < 10), k = 10, cent, nprobe = nprobe,
        model, shortlist = shortlist))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ann] ksub=$ksub m=$m nprobe=$nprobe shortlist=$shortlist recall@10=$r%.3f t=$dt%.1fs")
    }
    spark.stop()
  }
}
