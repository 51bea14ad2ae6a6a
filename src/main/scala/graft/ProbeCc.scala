package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe: CC loop cost vs scoped shuffle-partition count, and
  * the post-CC anti-join cost in q_corpus_dedup. */
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val pairs = operators.Dedup.minhashPairs(
      Tables.documents(spark, d), "doc_id", "text",
      numHashes = 16, bands = 8, threshold = 0.1,
      bandBucketCap = 512, stopShingleDfFrac = Some(0.5))
      .localCheckpoint(true)
    println(s"[probe] pairs = ${pairs.count()}")
    (1 to 2).foreach { rep =>
      t(s"cc(adaptive) rep$rep")(
        operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b").count())
    }
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // full query end-to-end
    (1 to 2).foreach { rep =>
      t(s"q_corpus_dedup rep$rep")(
        SparkEntry.queries("q_corpus_dedup")(spark, d).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
