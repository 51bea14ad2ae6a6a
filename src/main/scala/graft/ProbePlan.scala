package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
/** Formatted-plan probe: print the physical plan of the named declared
  * queries (plan-audit tool behind PLANS.md).
  * Usage: runMain graft.ProbePlan <sfDir> <name>[,<name>...] */
object ProbePlan {
  def main(a: Array[String]): Unit = {
    val Array(sfDir, names) = a.take(2)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
