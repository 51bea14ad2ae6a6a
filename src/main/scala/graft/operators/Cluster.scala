package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayMath

/** Integer-exact k-means corpus clustering — the curation-grade
  * clustering layer (cluster-balanced sampling, mixture analysis,
  * SemDeDup-style per-cluster curation all start from "which cluster
  * is each document in?"). Reference scope anchor: the reference has
  * no clustering stage; this is north-star LLM-pipeline surface.
  *
  * The float Lloyd's fit (`Ivf.fitCentroids`) stays the ANN-tier
  * production path; THIS operator is the oracle-provable spelling:
  * every quantity is exact integer arithmetic, so assignment, centroid
  * updates and distances are bit-portable across engines and
  * independent of aggregation order (the `LinkGraph.pageRankHosts`
  * rule: sums of longs commute, sums of doubles do not).
  *
  * Determinism contract:
  *  - vectors quantize to LONG units of 10^-3 after a +1.0 translation
  *    (L2 distance is translation-invariant, and the shift makes every
  *    quantized value NONNEGATIVE — `quantize` ENFORCES this with a
  *    per-element raise_error, so a component ≤ -shift fails the job
  *    loudly instead of silently desynchronizing signed integer
  *    division corner cases between the engines; measured, both
  *    truncate toward zero — -7 div 2 = -7 // 2 = -3 — but the
  *    nonnegative domain is the contract the oracle CTEs are written
  *    against, so it fails closed). Both engines widen float→double
  *    exactly and round ties away from zero, so quantization is
  *    bit-identical.
  *  - seeds are the `k` md5-hash-ordered vectors (hash order is the
  *    repo-standard deterministic unbiased order — the `Ivf`
  *    id-ordered-sample lesson), centroid j = the j-th seed in that
  *    order.
  *  - assignment is argmin of the exact integer squared L2 distance,
  *    ties to the smallest centroid id (`NearestCentroidCell` keeps
  *    the first strict minimum; the oracle's row_number orders by
  *    (dist, j)). Distances ≤ dim·(2·scale)^2 ≈ 2^27: double-exact,
  *    so the codegen expression compares them exactly.
  *  - centroid update is the elementwise integer mean `sum div count`;
  *    an emptied cluster keeps its previous centroid (the `Ivf.lloyd`
  *    rule, spelled with `coalesce` in the oracle).
  *
  * Scale shape: per iteration ONE corpus scan (assignment is a native
  * codegen expression) + ONE partial+final aggregation keyed
  * (cluster, dim-position) — k·dim keys, map-side combined, so the
  * shuffle is constant-size regardless of corpus size; driver state is
  * the k·dim long centroid matrix (bounded model state, the
  * repo-standard collect class). At 100 TB you fit on a hash-ordered
  * sample (`Ivf.fitCentroids` does exactly this) and pay the full scan
  * only for the final assignment; the full-corpus EM here is the
  * oracle-exact declared spelling with the identical plan per step.
  */
object Cluster {

  /** Long units of 10^-3 after a +`shift` translation. `shift` must
    * keep every component nonnegative (see the determinism contract);
    * 1.0 covers this corpus's (-1, 1) embedding range. A component at
    * or below -`shift` raises at scan time — the contract is enforced,
    * not assumed (ADVICE r13: a silently negative quantized value
    * would put every downstream integer division on an unaudited
    * signed-corner-case path). */
  def quantize(vec: Column, shift: Double = 1.0, scale: Int = 1000): Column =
    transform(vec.cast("array<double>"), x => {
      val q = round((x + lit(shift)) * lit(scale)).cast("long")
      when(q < 0L, raise_error(concat(
        lit(s"Cluster.quantize: component below -$shift (quantized "),
        q.cast("string"),
        lit(") violates the nonnegative determinism contract")))
        .cast("long")).otherwise(q)
    })

  private def qFrame(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol).cast("long").as("vec_id"),
      quantize(col(vecCol)).as("q"))

  private def hashOrder: Column =
    md5(col("vec_id").cast("string").cast("binary"))

  /** The fitted k×dim integer centroid matrix after `iters` full-EM
    * steps from the md5-ordered seeds. Driver state: k·dim longs. */
  def fitKmeans(emb: DataFrame, idCol: String, vecCol: String,
                k: Int = 8, iters: Int = 3): Array[Array[Long]] = {
    val q = qFrame(emb, idCol, vecCol)
    // Seeds: collect (id, md5, q) for the k hash-smallest ids and
    // re-sort driver-side so centroid index j is pinned to the hash
    // order independent of collect order.
    val seeds = q.orderBy(hashOrder, col("vec_id")).limit(k)
      .select(col("vec_id"), hashOrder.as("__h"), col("q"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getSeq[Long](2).toArray))
      .sortBy(t => (t._1, t._2))
    require(seeds.length == k, s"kmeans: need $k seed vectors, got ${seeds.length}")
    var cent = seeds.map(_._3)
    val dim = cent(0).length
    for (_ <- 1 to iters) {
      val assigned = q.withColumn("cl",
        ArrayMath.nearestCell(col("q"), cent.map(_.map(_.toDouble))))
      // k·dim-keyed elementwise sums — constant-size shuffle + collect.
      val stats = assigned
        .select(col("cl"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy("cl", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
      val sums = Array.ofDim[Long](k, dim)
      val counts = new Array[Long](k)
      stats.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        sums(c)(p) = r.getLong(2)
        counts(c) = r.getLong(3)
      }
      cent = Array.tabulate(k) { c =>
        if (counts(c) == 0L) cent(c)
        else Array.tabulate(dim)(j => sums(c)(j) / counts(c))
      }
    }
    cent
  }

  /** (vec_id, cluster, dist) under a fitted centroid matrix: cluster
    * via the native argmin expression, dist the exact integer squared
    * L2 to the nearest centroid — one scan, zero shuffle. */
  def assignClusters(emb: DataFrame, idCol: String, vecCol: String,
                     cent: Array[Array[Long]]): DataFrame = {
    val cd = cent.map(_.map(_.toDouble))
    val dists = cd.map(c =>
      ArrayMath.sqDiffSum(col("q"), typedLit(c.toSeq)))
    qFrame(emb, idCol, vecCol)
      .select(col("vec_id"),
        ArrayMath.nearestCell(col("q"), cd).cast("int").as("cluster"),
        least(dists: _*).cast("long").as("dist"))
  }

  /** Fit + final assignment — the declared `q_kmeans_clusters` body. */
  def kmeansClusters(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int = 8, iters: Int = 3): DataFrame =
    assignClusters(emb, idCol, vecCol,
      fitKmeans(emb, idCol, vecCol, k, iters))

  /** Per-cluster profile over an assignment frame: member count and
    * the integer mean squared distance (`sum div count` — the centroid
    * update's own arithmetic, so it needs no float). One k-keyed agg. */
  def clusterStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("cluster")
      .agg(count(lit(1)).as("n"),
        expr("sum(dist) div count(1)").cast("long").as("avg_dist"))
      .select("cluster", "n", "avg_dist")

  /** Cluster-level corpus composition — the mixture-analysis payoff of
    * clustering: per cluster, its document count, total whitespace
    * tokens, and corpus share in parts-per-million (`(tokens · 10^6)
    * div total` — all-integer, the `pageRankHosts` portability rule).
    * The share table is what cluster-proportional sampling and
    * mixture-rebalance decisions read. One id-keyed equi-join (both
    * sides corpus-scale → shuffle equi-join, exactly right) + one
    * k-keyed agg + a broadcast 1-row total. */
  def clusterMix(assigned: DataFrame, docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val toks = size(filter(split(col(textCol), " "), t => t =!= ""))
    val joined = assigned.join(
      docs.select(col(idCol).cast("long").as("vec_id"),
        toks.cast("long").as("__t")),
      Seq("vec_id"))
    val per = joined.groupBy("cluster")
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("n_tokens"))
    per.crossJoin(broadcast(per.agg(sum(col("n_tokens")).as("__tot"))))
      .select(col("cluster"), col("n_docs"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        expr("(n_tokens * 1000000L) div __tot").cast("bigint").as("share_ppm"))
  }

  /** Budget-constrained cluster-proportional selection — the curation
    * op the mixture report feeds: a global token `budget` splits
    * across clusters by their ppm share (`alloc_c = (budget ·
    * share_ppm) div 10^6`, all-integer), and each cluster keeps its
    * md5-hash-ordered prefix whose running token sum stays within its
    * allocation — so downsampling preserves the corpus's cluster
    * composition instead of letting the dominant cluster eat the
    * budget. Per-cluster running sums are one cluster-keyed window
    * (the hash order is unique, so the default frame is exact);
    * allocations attach by broadcasting the k-row share table. */
  def clusterBudget(assigned: DataFrame, docs: DataFrame, idCol: String,
                    textCol: String, budget: Long): DataFrame = {
    val toks = size(filter(split(col(textCol), " "), t => t =!= ""))
    val joined = assigned.join(
      docs.select(col(idCol).cast("long").as("vec_id"),
        toks.cast("long").as("n_tokens")),
      Seq("vec_id"))
    val alloc = clusterMix(assigned, docs, idCol, textCol)
      .select(col("cluster"),
        expr(s"(${budget}L * share_ppm) div 1000000").as("__alloc"))
    joined.join(broadcast(alloc), Seq("cluster"))
      .withColumn("cum_tokens",
        sum(col("n_tokens")).over(Window.partitionBy("cluster")
          .orderBy(hashOrder, col("vec_id"))).cast("bigint"))
      .filter(col("cum_tokens") <= col("__alloc"))
      .select("cluster", "vec_id", "n_tokens", "cum_tokens")
  }

  /** Cluster-purity eval against an external label column — how well
    * do the fitted clusters align with known classes? Per cluster: the
    * MODAL label with deterministic tie-break (count desc, then label
    * asc — the `anchorStats` top-text rule), its count, and purity in
    * parts-per-million (`(top_n · 10^6) div n`, all-integer). The
    * measurement harness itself stays oracle-pinned
    * (the `q_retrieval_eval` discipline). One id-keyed equi-join +
    * (cluster, label)-keyed aggs — k·|labels| bounded. */
  def clusterPurity(assigned: DataFrame, emb: DataFrame, idCol: String,
                    labelCol: String): DataFrame = {
    val labeled = assigned.join(
      emb.select(col(idCol).cast("long").as("vec_id"),
        col(labelCol).cast("int").as("__l")),
      Seq("vec_id"))
    val perLabel = labeled.groupBy("cluster", "__l")
      .agg(count(lit(1)).as("__c"))
    val top = perLabel
      .withColumn("__rn", row_number().over(Window.partitionBy("cluster")
        .orderBy(col("__c").desc, col("__l"))))
      .filter(col("__rn") === 1)
      .select(col("cluster"), col("__l").as("top_label"),
        col("__c").as("top_n"))
    labeled.groupBy("cluster").agg(count(lit(1)).as("n"))
      .join(top, Seq("cluster"))
      .select(col("cluster"), col("n"), col("top_label"), col("top_n"),
        expr("(top_n * 1000000L) div n").cast("bigint").as("purity_ppm"))
  }

  /** Cluster-BALANCED sample: at most `cap` members per cluster in
    * md5-hash order (deterministic "random" without an RNG — the
    * `cellCap` discipline). Balancing across clusters instead of
    * uniform sampling is the curation recipe that keeps rare topical
    * clusters represented when downsampling a dominated corpus. One
    * cluster-keyed window — row-local at any corpus size. */
  def clusterSample(assigned: DataFrame, cap: Int = 40): DataFrame =
    assigned
      .withColumn("rank", row_number().over(Window.partitionBy("cluster")
        .orderBy(hashOrder, col("vec_id"))).cast("int"))
      .filter(col("rank") <= cap)
      .select("cluster", "rank", "vec_id", "dist")
}
