package graft.functions

import scala.util.Random
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AND-OR random-projection LSH over `array<double>` columns, built
  * entirely from codegen'd higher-order expressions — no MLlib vector
  * interop, no per-pair UDF.
  *
  * Each of `L` hash tables keys a point by `r` quantized random
  * projections (AND-amplification inside a table → selective buckets;
  * OR across the `L` tables → recall). Candidate pairs are points
  * sharing any table key: the shuffle carries (table, key) — never a
  * crossJoin — and exact distance/cosine verification runs only on
  * candidates. This is the 100 TB shape for near-dup and ANN work:
  * cost tracks the true near-pair density, not n².
  *
  * Replaces MLlib's BucketedRandomProjectionLSH in our operators:
  * its approxSimilarityJoin has 1 projection per table (weak
  * selectivity) and verifies with a non-codegen UDF — measured 22 s
  * on 500×64-d rows vs <1 s for this implementation.
  */
object VectorLsh {

  /** Deterministic N(0,1) projection matrix (L·r rows × dim). */
  private def gaussians(dim: Int, L: Int, r: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new Random(seed)
    Array.fill(L * r)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** md5-derived uniform[−1, 1) projection matrix — the ENGINE-PORTABLE
    * plane family for the `sim_lsh_topk_md5` proof twin: plane t,
    * component j is 2·u − 1 where u is the first 13 hex chars (52
    * bits, double-exact) of md5("t:j") as a fraction of 16¹³ — the
    * exact arithmetic DuckDB restates with substr/::UBIGINT, so both
    * engines hold bit-identical matrices. Uniform, not Gaussian:
    * random-projection LSH only needs a symmetric direction
    * distribution, and the twin's role is pinning the bucket/candidate
    * algebra (the production paths keep seeded Gaussians). */
  def md5Planes(dim: Int, nPlanes: Int): Array[Array[Double]] = {
    val scale = math.pow(16.0, 13)
    Array.tabulate(nPlanes) { t =>
      Array.tabulate(dim) { j =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$t:$j".getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        val u = java.lang.Long.parseLong(hex.substring(0, 13), 16).toDouble / scale
        2.0 * u - 1.0
      }
    }
  }

  private def dotLit(vec: Column, g: Array[Double]): Column =
    ArrayMath.dot(vec, array(g.toIndexedSeq.map(lit): _*))

  /** `L` composite bucket keys for a vector column. */
  def bucketKeys(vec: Column, dim: Int, L: Int, r: Int, w: Double,
                 seed: Long = 42L): Column =
    bucketKeysPlanes(vec, gaussians(dim, L, r, seed), L, r, w)

  /** `bucketKeys` over an explicit projection matrix (L·r × dim) —
    * the entry point the md5 proof twin shares with the production
    * seeded-Gaussian path. */
  def bucketKeysPlanes(vec: Column, g: Array[Array[Double]],
                       L: Int, r: Int, w: Double): Column = {
    require(g.length == L * r, s"need ${L * r} planes, got ${g.length}")
    val keys = (0 until L).map { l =>
      val parts = (0 until r).map(j =>
        floor(dotLit(vec, g(l * r + j)) / lit(w)).cast("long").cast("string"))
      concat_ws("_", lit(l.toString) +: parts: _*)
    }
    array(keys: _*)
  }

  /** Distinct candidate pairs (id_a < id_b, euclidean dist) sharing
    * any bucket key.
    *
    * `bucketCap` bounds the quadratic term: buckets holding more than
    * `bucketCap` points are dropped from candidate generation (worst
    * case cost cap²/2 per bucket), so a skewed or badly-tuned hash
    * can make the result MORE approximate but never make the job
    * explode — the property that matters at 100 TB. Dense regions
    * lose only far-pair candidates; near pairs still co-occur in the
    * other L−1 tables with high probability.
    *
    * The exact distance is computed AT the join (while both vectors
    * are in hand) and the pair-dedup groups scalars only — an
    * array-typed agg buffer would force slow sort-based aggregation
    * (measured: minutes vs seconds at 100k rows). */
  def candidatePairs(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, L: Int, r: Int, w: Double,
                     seed: Long = 42L, bucketCap: Int = 1000): DataFrame =
    candidatePairsKeys(df, idCol, vecCol,
      bucketKeys(col(vecCol), dim, L, r, w, seed), bucketCap)

  /** `candidatePairs` over an explicit keys column (shared by the
    * production seeded path and the md5 proof twin).
    *
    * r15 shape (guide §2.3/§8 — shuffle keys, attach payloads once):
    * the bucket self-join and the pair dedup run over (id, k) scalars
    * ONLY; vectors re-attach to the DISTINCT pairs afterwards and the
    * exact distance is computed once per pair instead of once per
    * bucket co-occurrence (a true near-pair co-occurs in up to L
    * tables, so the old at-the-join spelling paid the three dot
    * products up to L× per pair and shipped both vectors through the
    * candidate exchange). Per-vector squared norms are computed once
    * on the base frame. Values are bit-identical: the same double
    * arithmetic runs once instead of min-combining L identical
    * copies — the md5 proof twin's oracle still hash-matches. */
  def candidatePairsKeys(df: DataFrame, idCol: String, vecCol: String,
                         keysCol: Column, bucketCap: Int): DataFrame = {
    val keyed = df.select(col(idCol).as("id"), explode(keysCol).as("k"))
    val small = keyed.join(
      keyed.groupBy("k").count().filter(col("count") <= bucketCap).select("k"), "k")
    val cands = small.as("a").join(small.as("b"),
        col("a.k") === col("b.k") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val vecs = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      VectorOps.dot(col(vecCol), col(vecCol)).as("n2"))
    val dist = sqrt(greatest(
      col("a.n2") + col("b.n2") - lit(2.0) * VectorOps.dot(col("a.v"), col("b.v")),
      lit(0.0)))
    cands
      .join(vecs.as("a"), col("id_a") === col("a.id"))
      .join(vecs.as("b"), col("id_b") === col("b.id"))
      .select(col("id_a"), col("id_b"), dist.as("dist"))
  }

  /** Directed candidate edges (id → nid, both directions, no self),
    * for kNN-style consumers. */
  def candidateEdges(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, L: Int, r: Int, w: Double,
                     seed: Long = 42L, bucketCap: Int = 128): DataFrame = {
    val pairs = candidatePairs(df, idCol, vecCol, dim, L, r, w, seed, bucketCap)
    pairs.select(col("id_a").as("id"), col("id_b").as("nid"), col("dist"))
      .union(pairs.select(col("id_b").as("id"), col("id_a").as("nid"), col("dist")))
  }
}
