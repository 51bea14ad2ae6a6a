package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level checks of the declared query surface on sf0.001 (full
  * value-level oracle parity is the driver's t2 / tools/compare_oracle.py). */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("every declared query with an oracle has matching column intent") {
    // structural guard: every oracle key exists in queries
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("flagship scores all events with risk levels") {
    val df = Pipelines.scoreEvents(spark, sf)
    assert(df.count() == 1000)
    val levels = df.select("risk_level").distinct().collect().map(_.getString(0)).toSet
    assert(levels.subsetOf(Set("High", "Medium", "Low")))
    val oob = df.filter(col("aggregated_score") < 0 || col("aggregated_score") > 1).count()
    assert(oob == 0)
  }

  test("entry returns rows (driver t1 contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("profile agg row count equals distinct keys in window") {
    val prof = SparkEntry.queries("q_agg_customer_profile")(spark, sf)
    val n = prof.count()
    assert(n > 0 && n <= 150)
    // count column positive everywhere
    assert(prof.filter(col("cust_txn_count") <= 0).count() == 0)
  }

  test("dedup keeps one row per l_orderkey") {
    val dd = SparkEntry.queries("q_win_dedup")(spark, sf)
    assert(dd.select("l_orderkey").distinct().count() == dd.count())
  }

  test("sim_bruteforce returns 10 neighbors per query, none self") {
    val nn = SparkEntry.queries("q_sim_bruteforce")(spark, sf)
    val byQ = nn.groupBy("query_id").count().collect()
    assert(byQ.length == 10 && byQ.forall(_.getLong(1) == 10))
    assert(nn.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("jaccard pairs are symmetric-free (a<b) and within (0,1]") {
    val j = SparkEntry.queries("q_ngram_jaccard")(spark, sf)
    assert(j.filter(col("doc_a") >= col("doc_b")).count() == 0)
    assert(j.filter(col("jaccard") <= 0 || col("jaccard") > 1).count() == 0)
  }
}
