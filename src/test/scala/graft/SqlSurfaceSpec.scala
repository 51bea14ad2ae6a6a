package graft

import org.scalatest.funsuite.AnyFunSuite

/** The raw SQL surface: registered views + a few oracle SQL strings
  * running through spark.sql (ANSI subset shared with DuckDB). */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("registerAll exposes every table to spark.sql") {
    Tables.registerAll(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) FROM $n").head.getLong(0) > 0, n)
    }
  }

  test("native array functions register into the SQL surface") {
    graft.functions.ArrayMath.registerSql(spark)
    val dot = spark.sql(
      "SELECT array_dot(array(1.0D, 2.0D, 2.0D), array(2.0D, 4.0D, 4.0D))")
      .head.getDouble(0)
    assert(dot == 18.0)
    val mse = spark.sql(
      "SELECT array_sqdiff_sum(array(1.0D, 2.0D), array(3.0D, 4.0D)) / 2")
      .head.getDouble(0)
    assert(mse == 4.0)
    graft.functions.TextHash.registerSql(spark)
    // identical token arrays → identical signatures; interpreted eval
    // (head on a literal row) must agree with the codegen'd column path
    val Array(s1, s2) = spark.sql(
      "SELECT simhash64(split('a b c', ' ')), simhash64(split('a b c', ' '))")
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(s1 == s2)
    val s3 = spark.sql("SELECT simhash64(split('x y zz', ' '))").head.getLong(0)
    assert(s3 != s1)
  }

  test("GraftExtensions injects the full function surface cluster-wide") {
    import org.apache.spark.sql.SparkSession
    val base = spark // force shared-session init first
    // `spark.sql.extensions` is STATIC conf — getOrCreate reads it from
    // the SparkContext conf, which is fixed at spark-submit time and
    // can't be amended from a test sharing the context. withExtensions
    // drives the identical injection path (GraftExtensions.apply →
    // injectFunction) on a fresh session over the same context.
    try {
      // inside the try so a getOrCreate failure still restores `base`
      // as the default/active session for later suites
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base)
      assert(s2.sql("SELECT array_dot(array(1.0D,2.0D), array(3.0D,4.0D))")
        .head.getDouble(0) == 11.0)
      assert(s2.sql("SELECT simhash64(split('a b c',' '))").head.getLong(0) ==
        s2.sql("SELECT simhash64(split('a b c',' '))").head.getLong(0))
      assert(s2.sql("SELECT shingles(split('a b c d',' '), 3)")
        .head.getSeq[String](0) == Seq("a b c", "b c d"))
      // multiset form keeps the duplicate ("a b a b a" has "a b a" twice)
      assert(s2.sql("SELECT shingles_all(split('a b a b a',' '), 3)")
        .head.getSeq[String](0) == Seq("a b a", "b a b", "a b a"))
      assert(s2.sql("SELECT size(shingle_hashes(split('a b c d',' '), 3))")
        .head.getInt(0) == 2)
      // 8 tokens, k=3 → 6 k-grams, window=4 → 3 window minima (≤3 distinct)
      val wf = s2.sql("SELECT winnow_fingerprints(split('a b c d e f g h',' '), 3, 4)")
        .head.getSeq[String](0)
      assert(wf.nonEmpty && wf.size <= 3 && wf.forall(_.length == 32))
      // strided chunks: 7 tokens, window 5, stride 5 → 2 spans
      assert(s2.sql("SELECT chunk_spans(split('a b c d e f g',' '), 5, 5)")
        .head.getSeq[String](0) == Seq("a b c d e", "f g"))
      // char trigram buckets: 5 chars → 3 occurrences, ids in [0, nb)
      val tb = s2.sql("SELECT char_trigram_buckets('abcde', 256)")
        .head.getSeq[Long](0)
      assert(tb.size == 3 && tb.forall(b => b >= 0 && b < 256))
      // int-literal contract for shape params is enforced
      intercept[Exception] {
        s2.sql("SELECT shingles(split('a b',' '), cast(rand()*2 as int))").collect()
      }
      // wrong input type is rejected at analysis, not runtime
      intercept[org.apache.spark.sql.AnalysisException] {
        s2.sql("SELECT simhash64(array(1, 2))").collect()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("shared-dialect oracle SQL runs on Spark and matches the DataFrame plan") {
    Tables.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT o_custkey AS customer_id,
        | round(avg(o_totalprice), 6) AS cust_avg_amount,
        | count(*) AS cust_txn_count
        |FROM orders
        |WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 90 DAY
        |GROUP BY o_custkey ORDER BY customer_id""".stripMargin).collect()
    val viaDf = SparkEntry.queries("q_agg_customer_profile")(spark, sf).collect()
    assert(viaSql.toSeq == viaDf.toSeq)
  }
}
