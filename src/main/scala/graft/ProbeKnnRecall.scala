package graft
import org.apache.spark.sql.SparkSession
object ProbeKnnRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val exact = SparkEntry.queries("q_knn_graph")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = SparkEntry.queries("q_knn_graph_ivf")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[recall] sf0.1 recall@5 = ${(exact & ivf).size.toDouble / exact.size}%.4f (${(exact & ivf).size}/${exact.size})")
    spark.stop()
  }
}
