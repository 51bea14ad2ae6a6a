package graft
import org.apache.spark.sql.SparkSession
/** Smoke runner mirroring the driver's t1 check: SparkEntry.entry must
  * return rows > 0 on sf0.001. */
object Probe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.entry(spark)
    println(s"[smoke] entry rows=${df.count()}")
    df.show(5, false)
    spark.stop()
  }
}
