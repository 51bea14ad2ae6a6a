package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** VERDICT r11 #1 protocol — root-cause the decontamination-stream
  * driver-bench regression (`q_decontaminate_stream` 7.9×,
  * `q_decontaminate_fuzzy_stream` 4.0× on code untouched since ~r7):
  * five consecutive same-session sf0.1 drains at HEAD (the r10
  * substrings protocol), plus a per-micro-batch wall-time profile via
  * a StreamingQueryListener so the drain's cost decomposes into batch
  * count × batch time. Prints one line per run and a per-batch
  * breakdown for the solo profiled drain. */
object ProbeDecon {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-micro-batch telemetry: (queryName, batchId, durationMs, rows)
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        batches.add((p.name, p.batchId,
          Option(p.durationMs.get("triggerExecution")).map(_.toLong)
            .getOrElse(-1L),
          p.numInputRows))
      }
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })

    def sweep(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      spark.sharedState.cacheManager.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("__graft_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }

    def time(tag: String)(body: => Long): Double = {
      val t0 = System.nanoTime()
      val n = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[decon] $tag%-28s ${s}%7.2f s  rows=$n")
      sweep()
      s
    }

    // warm once (fresh-JVM codegen + state-store init, untimed — the
    // r10 substrings lesson: the first drain pays ~9 s of JVM warmup)
    time("warm q_decontaminate_stream") {
      streaming.CorpusStream.decontaminatedOverFile(spark, sfDir).count()
    }
    time("warm q_decon_fuzzy_stream") {
      streaming.CorpusStream.fuzzyDecontaminatedOverFile(spark, sfDir).count()
    }
    time("warm q_decontaminate_fuzzy") {
      SparkEntry.queries("q_decontaminate_fuzzy")(spark, sfDir).count()
    }

    val runs = (1 to 5).map { i =>
      val a = time(s"run$i q_decontaminate_stream") {
        streaming.CorpusStream.decontaminatedOverFile(spark, sfDir).count()
      }
      val b = time(s"run$i q_decon_fuzzy_stream") {
        streaming.CorpusStream.fuzzyDecontaminatedOverFile(spark, sfDir).count()
      }
      val c = time(s"run$i q_decontaminate_fuzzy") {
        SparkEntry.queries("q_decontaminate_fuzzy")(spark, sfDir).count()
      }
      (a, b, c)
    }
    def stats(xs: Seq[Double], tag: String): Unit =
      println(f"[decon] FIVE-RUN $tag%-26s min=${xs.min}%.2f " +
        f"max=${xs.max}%.2f spread=${xs.max / xs.min}%.2fx " +
        s"all=${xs.map(x => f"$x%.2f").mkString(",")}")
    stats(runs.map(_._1), "q_decontaminate_stream")
    stats(runs.map(_._2), "q_decontaminate_fuzzy_stream")
    stats(runs.map(_._3), "q_decontaminate_fuzzy")

    // solo per-batch profile of the last drains (names are unique per
    // run via the runner's sequence counter — group and print all)
    import scala.jdk.CollectionConverters._
    val byQ = batches.asScala.toSeq.groupBy(_._1)
    byQ.toSeq.sortBy(_._1).foreach { case (name, bs) =>
      val tot = bs.map(_._3).sum
      println(s"[decon] batches $name: n=${bs.size} totalTriggerMs=$tot " +
        s"perBatchMs=${bs.sortBy(_._2).map(_._3).mkString(",")}")
    }
    spark.stop()
  }
}
