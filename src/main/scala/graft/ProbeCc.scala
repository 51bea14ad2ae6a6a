package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Staged timing of the connected-components family at sf0.1 — the
  * probe behind the r7 driver-union-find fast path (the distributed
  * loop's ~5-exchange × O(log d)-round scheduling cost measured 1-2 s
  * on a 257-edge list regardless of partition count; the fast path
  * closes it in milliseconds). */
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
    // full query end-to-end
    (1 to 2).foreach { rep =>
      t(s"q_corpus_dedup rep$rep")(
        SparkEntry.queries("q_corpus_dedup")(spark, d).count())
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
