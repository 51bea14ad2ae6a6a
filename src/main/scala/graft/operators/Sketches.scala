package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch heavy hitters — the fixed-memory frequency sketch
  * (Cormode & Muthukrishnan 2005) next to the exact `topTermsPerGroup`
  * path: `depth`·`width` integer counters summarize an unbounded term
  * stream, every point estimate `min_i(counter[i][h_i(t)])` is an
  * OVER-estimate (never under), and two sketches merge by elementwise
  * addition — the property that makes it the 100 TB shape (each
  * executor's partial sketch is the map-side combine of one
  * constant-size agg; no term-keyed shuffle of the long tail at all
  * when only the sketch is wanted).
  *
  * Portability contract (the `portableMd5` twin discipline): row i's
  * hash is the leading 24 bits of `md5(i || ':' || term)` mod `width` —
  * both engines spell it identically, so the whole sketch, every
  * estimate, and the error report are value-for-value reproducible in
  * SQL. Like `q_retrieval_eval` / `q_sq_distortion`, the declared
  * query reports the sketch's DISTORTION: estimate vs exact count per
  * surviving heavy hitter (`err = est - exact >= 0` by construction —
  * a negative error anywhere means the sketch implementation is
  * wrong).
  */
object Sketches {

  private def toks(textCol: Column): Column =
    filter(split(textCol, " "), t => t =!= "")

  /** CMS cell index for hash row `i`: leading 24 bits of the row-keyed
    * md5, mod width — nonnegative, engine-portable. */
  private def cellOf(i: Column, term: Column, width: Int): Column =
    (conv(substring(md5(concat(i.cast("string"), lit(":"), term)
      .cast("binary")), 1, 6), 16, 10).cast("long") % width).cast("int")

  /** The (i, c, cnt) cell table of a count-min sketch over a
    * whitespace-tokenized text frame — `depth` cells per token, a
    * (depth·width)-keyed partial+final count, i.e. CONSTANT-SIZE
    * shuffle and state regardless of corpus size. Streaming-legal as
    * a complete-mode aggregation for the same reason: the standing
    * state IS the depth·width cell grid (`q_heavy_hitters_stream`). */
  def cmsSketch(docs: DataFrame, textCol: String, depth: Int = 3,
                width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad depth=$depth width=$width")
    docs.select(explode(toks(col(textCol))).as("term"))
      .select(explode(array((0 until depth).map(lit): _*)).as("i"),
        col("term"))
      .select(col("i"), cellOf(col("i"), col("term"), width).as("c"))
      .groupBy("i", "c").agg(count(lit(1)).as("cnt"))
  }

  /** The heavy-hitter report over an already-built sketch: every
    * distinct term of `docs` probed (`depth` lookups, min-combined)
    * against the broadcast cell table, joined to its exact count for
    * the error column, top-`topK` by (est desc, term). The exact side
    * exists for the REPORT — a sketch-only consumer drops it and with
    * it every term-keyed exchange. */
  def cmsReport(sketch: DataFrame, docs: DataFrame, textCol: String,
                depth: Int = 3, width: Int = 256,
                topK: Int = 20): DataFrame = {
    val exact = docs.select(explode(toks(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("exact"))
    exact
      .withColumn("i", explode(array((0 until depth).map(lit): _*)))
      .withColumn("c", cellOf(col("i"), col("term"), width))
      .join(broadcast(sketch), Seq("i", "c"))
      .groupBy("term", "exact").agg(min(col("cnt")).as("est"))
      .select(col("term"), col("est"), col("exact"),
        (col("est") - col("exact")).as("err"))
      .orderBy(col("est").desc, col("term")).limit(topK)
  }

  /** Top-`topK` terms by CMS estimate with the exact-count error
    * report: (term, est, exact, err) ranked (est desc, term).
    *
    * Plan shape: ONE tokenize+explode pass per half feeds the sketch
    * build (constant-size agg) and the exact per-term agg; estimates
    * attach by broadcasting the depth·width-cell sketch onto the
    * distinct-term probes; top-k is orderBy+limit →
    * TakeOrderedAndProject. */
  def cmsHeavyHitters(docs: DataFrame, textCol: String, depth: Int = 3,
                      width: Int = 256, topK: Int = 20): DataFrame =
    cmsReport(cmsSketch(docs, textCol, depth, width), docs, textCol,
      depth, width, topK)
}
