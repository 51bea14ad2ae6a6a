package graft

import org.apache.spark.sql.SparkSession

/** One-off plan dump for the crawl flagship — where do its hash
  * exchanges come from? */
object ProbePlanCrawl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val plan = SparkEntry.queries("q_crawl_pipeline")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    val lines = plan.linesIterator.filter(l =>
      l.contains("Exchange hashpartitioning") || l.contains("Join") ||
        l.contains("Generate") || l.contains("Scan") ||
        l.contains("Aggregate") || l.contains("Window"))
    lines.foreach(l => println(l.replaceAll("#\\d+L?", "").take(180)))
    spark.stop()
  }
}
