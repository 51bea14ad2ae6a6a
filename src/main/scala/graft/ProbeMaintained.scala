package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Phase profiler for the maintained corpus/graph family (guide §1.1/
  * §1.5): runs a named declared query once warm + once timed with a
  * job listener aggregating per-phase job counts and wall time, so the
  * per-micro-batch cost breaks down into labeled phases instead of one
  * opaque total. Phases come from `Phases.phase` labels inside
  * `CorpusPipeline.MaintainedCorpus.advance` / `GraphStream.
  * MaintainedGraph.advance`; unlabeled jobs land in "(none)".
  * Usage: runMain graft.ProbeMaintained <query> [<query>...] */
object ProbeMaintained {
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
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val agg = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("(none)")
        jobStart.put(js.jobId, (desc, System.nanoTime())): Unit
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobStart.remove(je.jobId)).foreach { case (desc, t0) =>
          val dt = System.nanoTime() - t0
          agg.merge(desc, (1, dt),
            (a, b) => (a._1 + b._1, a._2 + b._2)): Unit
        }
      }
    }
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm (codegen, state-store init)
      agg.clear(); jobStart.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.removeSparkListener(listener)
      println(s"==== $name wall=${f"$wall%.2f"}s ====")
      val rows = agg.entrySet().iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Int, Double)]
      while (rows.hasNext) {
        val e = rows.next()
        buf += ((e.getKey, e.getValue._1, e.getValue._2 / 1e9))
      }
      var totJobs = 0
      var totSec = 0.0
      buf.sortBy(-_._3).foreach { case (label, n, sec) =>
        totJobs += n; totSec += sec
        println(f"[phase] $label%-34s jobs=$n%4d  sec=$sec%7.2f")
      }
      println(f"[phase] TOTAL jobs=$totJobs sum=$totSec%.2f wall=$wall%.2f " +
        f"(driver/gap=${wall - totSec}%.2f)")
    }
    spark.stop()
  }
}
