package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// Scratch profiler for the continuous-corpus advance — NOT committed.
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nJobs = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        nJobs.incrementAndGet(): Unit
      }
    })
    def step[T](name: String)(body: => T): T = {
      val j0 = nJobs.get; val t0 = System.nanoTime; val r = body
      println(f"STEP $name%-28s ${(System.nanoTime - t0) / 1e9}%6.2f s  jobs=${nJobs.get - j0}"); r
    }
    val sfd = "/root/testdata/sf0.1"
    val feed = Tables.documents(spark, sfd).select(col("doc_id"), col("text"))
      .join(Tables.embeddings(spark, sfd)
        .select(col("vec_id").as("doc_id"), col("embedding").cast("array<double>").as("embedding")), Seq("doc_id"))
    val slices = (0 until 4).map { s => feed.filter(pmod(xxhash64(col("doc_id")), lit(4)) === s).localCheckpoint() }
    val root = java.nio.file.Files.createTempDirectory("graft_cp6").toString
    val mcW = new streaming.CorpusPipeline.MaintainedCorpus(spark, s"$root/warm", 5)
    (0 until 3).foreach(i => mcW.advance(i, slices(i)): Unit)
    val b = step("b.localCheckpoint")(slices(3).select(col("doc_id").cast("long").as("doc_id"),
      col("text"), col("embedding").cast("array<double>").as("embedding")).localCheckpoint())
    step("b.isEmpty")(b.limit(1).count())
    val docs0 = mcW.docs; val pairs0 = mcW.pairs; val kept0 = mcW.kept.select("doc_id")
    step("seen-guard")(docs0.join(b, Seq("doc_id"), "left_semi").limit(1).count())
    val allDocs = step("allDocs.localCheckpoint")(docs0.unionByName(b).localCheckpoint())
    val newPairs = step("incrementalPairs(incl ckpt)")(
      streaming.CorpusPipeline.incrementalPairs(allDocs, b.select("doc_id"), 16, 8, 0.1, 3))
    val pairs1 = step("pairs1.localCheckpoint")(pairs0.unionByName(newPairs).dropDuplicates("doc_a", "doc_b").localCheckpoint())
    val nonSurv = step("connectedComponents")(operators.Dedup.connectedComponents(pairs1, "doc_a", "doc_b")
      .filter(col("is_survivor") === 0).select(col("node").as("doc_id")).localCheckpoint())
    val kept1 = step("kept1.localCheckpoint")(allDocs.select("doc_id").join(nonSurv, Seq("doc_id"), "left_anti").localCheckpoint())
    val evicted = kept0.join(kept1, Seq("doc_id"), "left_anti")
    val fresh = kept1.join(kept0, Seq("doc_id"), "left_anti")
    val freshEmb = allDocs.join(fresh, Seq("doc_id"), "left_semi").select("doc_id", "embedding")
    val nEv = step("evicted.count")(evicted.count())
    step("graph.advance")(mcW.graph.advance(3, freshEmb, if (nEv > 0) Some(evicted) else None))
    step("state-writes")(Seq("docs2" -> allDocs, "pairs2" -> pairs1, "kept2" -> kept1).foreach {
      case (k, df) => df.write.mode("overwrite").parquet(s"$root/warm/$k/v=4")
    })
    spark.stop()
  }
}
