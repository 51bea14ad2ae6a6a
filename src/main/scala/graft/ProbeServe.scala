package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Staged timing of the ANN serve path at the x96 soak scale — the
  * probe that caught (and now guards) two per-task hazards: shard
  * arrays riding the task binary (deserialized per task: 18-40 s for
  * a 10-row feed) and per-task lazy-val norms recomputation with
  * accessor indirection in the scan loop (13 s). Post-fix, count ≈
  * directEval ≈ 0.15 s. Kept as the reproduction harness; run after
  * `ProbeSoak gen` has produced soak/x96. */
object ProbeServe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet("soak/x96/embeddings.parquet")
    def t[T](tag: String)(body: => T): T = {
      val t0 = System.nanoTime(); val r = body
      println(f"[probe] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r
    }
    val shard = t("fitShard")(operators.AnnServe.fitShard(e))
    val q = t("queries")(e.filter(col("vec_id") < 10).localCheckpoint(true))
    val df = t("build")(operators.AnnServe.topkRows(q, shard))
    t("explain")(df.queryExecution.executedPlan)
    t("count1")(df.count())
    t("count2")(df.count())
    val df2 = t("build2")(operators.AnnServe.topkRows(q, shard))
    t("count3")(df2.count())
    val bc = shard.broadcastWith(spark.sparkContext)
    t("countBase")(q.count())
    val noExpl = q.select(graft.functions.ArrayMath.cosineTopK(
      col("vec_id"), col("embedding"), bc, shard.dim, 10).as("nb"))
    t("countNoExplode")(noExpl.count())
    t("countNoExplode2")(noExpl.count())
    val one = t("coalesce1")(q.coalesce(1))
    t("countCoalesced")(operators.AnnServe.topkRows(one, shard).count())
    // how much is raw scan work? eval directly, no Spark
    val qRows = q.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>")).collect()
    t("directEval") {
      val expr = graft.functions.CosineTopK(
        org.apache.spark.sql.catalyst.expressions.Literal(0L),
        org.apache.spark.sql.catalyst.expressions.Literal(0L),
        shard.broadcastWith(spark.sparkContext), shard.dim, 10)
      qRows.foreach { r =>
        val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          r.getSeq[Double](1).toArray)
        expr.topk(r.getLong(0), arr)
      }
    }
    spark.stop()
  }
}
