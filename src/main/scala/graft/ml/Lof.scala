package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorOps

/** Local Outlier Factor — custom, since MLlib has none (SURVEY §2.8
  * `ml_lof`; reference `train.py:76-77`, k=20, novelty=True).
  *
  * Built set-oriented from a kNN edge list: kdist → reachability →
  * lrd → LOF as three chained agg/join passes (each a key-partitioned
  * shuffle — no driver state). Two neighbor sources:
  *   - `exactNeighbors`: brute-force O(n²) self-join — correctness
  *     reference for tests / small N only;
  *   - `lshNeighbors`: expression-based AND-OR LSH (`VectorLsh`) —
  *     the 100 TB path (bucket-local candidate pairs, then per-point
  *     top-k). Radius chosen by the caller (estimate from a sample).
  *
  * NB the reference's wrapper returns TRAINING-set scores for any
  * input when `negative_outlier_factor_` exists (`model_wrapper.py:
  * 35-42`) — a bug we do not replicate; we score the rows actually
  * given (the `_decision_function` path, `app1.py:74-75`).
  */
object Lof {

  /** Brute-force kNN edges (id, nid, dist), k nearest per id.
    * Deterministic ties: (dist asc, nid asc). */
  def exactNeighbors(df: DataFrame, idCol: String, featuresCol: String, k: Int): DataFrame = {
    val a = df.select(col(idCol).as("id"), col(featuresCol).as("fa"))
    val b = df.select(col(idCol).as("nid"), col(featuresCol).as("fb"))
    // clamp: float error can push |a|²+|b|²−2a·b slightly negative for
    // identical rows (common after one-hot) → sqrt = NaN, which sorts
    // last and corrupts kdist/lrd. Same guard as VectorLsh.
    val dist = sqrt(greatest(
      VectorOps.dot(col("fa"), col("fa")) +
        VectorOps.dot(col("fb"), col("fb")) -
        lit(2.0) * VectorOps.dot(col("fa"), col("fb")), lit(0.0)))
    val w = Window.partitionBy("id").orderBy(col("dist").asc, col("nid").asc)
    a.crossJoin(b).filter(col("id") =!= col("nid"))
      .select(col("id"), col("nid"), dist.as("dist"))
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Approximate kNN edges via expression-based AND-OR LSH
    * (`VectorLsh`): bucket-collision candidates, exact distances on
    * candidates only, per-point top-k. Points with no candidate drop
    * out (acceptable for an approximate scorer; widen `w` or raise `L`
    * to recover). */
  def lshNeighbors(df: DataFrame, idCol: String, featuresCol: String,
                   k: Int, radius: Double, seed: Long = 42L,
                   tables: Int = 8, projections: Int = 2,
                   bucketCap: Int = 128): DataFrame = {
    val dim = df.select(size(col(featuresCol))).head().getInt(0)
    val edges = graft.functions.VectorLsh.candidateEdges(
      df.select(col(idCol), col(featuresCol)), idCol, featuresCol,
      dim, tables, projections, math.max(radius, 1e-6), seed, bucketCap)
    val w = Window.partitionBy("id").orderBy(col("dist").asc, col("nid").asc)
    edges.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  /** Radius heuristic for `lshNeighbors`: the pair-distance quantile at
    * which a point expects ~`targetPerPoint` neighbors (fraction p of
    * pairs within radius ⇒ ≈ p·n neighbors each). Estimated from a
    * constant-size sample — O(sampleSize²) driver-free work. */
  def estimateRadius(df: DataFrame, idCol: String, featuresCol: String,
                     targetPerPoint: Int, n: Long,
                     sampleSize: Int = 300): Double = {
    val q = math.max(1e-4, math.min(0.5, targetPerPoint.toDouble / math.max(n, 1L)))
    val s = df.select(col(idCol).as("id"), col(featuresCol).as("f")).limit(sampleSize)
    val d = s.as("a").crossJoin(s.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(sqrt(greatest(
                VectorOps.dot(col("a.f"), col("a.f")) +
                  VectorOps.dot(col("b.f"), col("b.f")) -
                  lit(2.0) * VectorOps.dot(col("a.f"), col("b.f")), lit(0.0)))
                .as("dist"))
    d.agg(expr(s"percentile_approx(dist, $q, 10000)")).head().getDouble(0)
  }

  /** kNN edge list → (id, lrd, lof). lrd = 1/(mean reach + 1e-10)
    * (sklearn's stabilizer); LOF = mean(lrd_neighbor)/lrd.
    *
    * The edge list is referenced three times (kdist, reach, the
    * neighbor-lrd join); without materialization each reference
    * re-executes the upstream kNN DAG — measured 3.9 s → 1.9 s at
    * sf0.1 for the LSH path. `localCheckpoint` materializes the O(n·k)
    * edges once and is cleaned by the ContextCleaner when unreachable
    * (unlike `persist`, which registers in the session CacheManager
    * and leaks per call — the r1 minhash lesson). On a cluster the
    * same role is played by a checkpoint/intermediate table.
    * `eager = false`: materialization happens on the FIRST action, not
    * at plan-build time — merely declaring/explaining the query must
    * not launch Spark jobs. */
  def fromNeighbors(nbIn: DataFrame): DataFrame = {
    val nb = nbIn.localCheckpoint(eager = false)
    val kdist = nb.groupBy("id").agg(max("dist").as("kdist"))
    val reach = nb.join(kdist.withColumnRenamed("id", "nid"), Seq("nid"))
      .withColumn("reach", greatest(col("dist"), col("kdist")))
    val lrd = reach.groupBy("id")
      .agg((lit(1.0) / (sum("reach") / count(lit(1)) + lit(1e-10))).as("lrd"))
    reach.select("id", "nid")
      .join(lrd.select(col("id").as("nid"), col("lrd").as("lrd_n")), Seq("nid"))
      .groupBy("id").agg(avg("lrd_n").as("__avg_lrd_n"))
      .join(lrd, Seq("id"))
      .select(col("id"), col("lrd"), (col("__avg_lrd_n") / col("lrd")).as("lof"))
  }

  /** Exact LOF scores (tests / small N). */
  def exact(df: DataFrame, idCol: String, featuresCol: String, k: Int): DataFrame =
    fromNeighbors(exactNeighbors(df, idCol, featuresCol, k))

  /** Fit a NOVELTY scorer (sklearn `novelty=True`, the reference's
    * actual configuration `train.py:76`): score NEW points against the
    * training set's kNN structure. Training-side kdist/lrd are
    * computed distributed, then a capped deterministic subsample is
    * collected as constant-size broadcast state; scoring is a per-row
    * UDF (k nearest among ≤`maxRefPoints` reference points — no
    * shuffle, streaming-safe). */
  def fitNovelty(df: DataFrame, idCol: String, featuresCol: String,
                 k: Int = 20, maxRefPoints: Int = 2000): LofNoveltyModel = {
    // The reference structure is CONSTANT-SIZE (≤ maxRefPoints rows),
    // so the O(ref²·d) kNN/kdist/lrd computation runs on the driver in
    // primitive arrays (~140 Mflops at 2k×35) — measured 0.3 s vs 17 s
    // for the equivalent crossJoin+window Spark plan on the same data.
    // Only the sample selection itself is distributed.
    val pts = df.select(col(idCol).as("id"), col(featuresCol).as("f"))
      // hash-ordered sample (same rationale as Ivf.fitCentroids): an
      // id-ordered prefix is a biased "normal" reference set whenever
      // ids correlate with content (time-ordered ingest, clustered
      // appends); hash order is equally deterministic and unbiased
      .orderBy(org.apache.spark.sql.functions.xxhash64(col("id")), col("id"))
      .limit(maxRefPoints)
      .collect().map(_.getSeq[Double](1).toArray)
    val n = pts.length
    val kk = math.min(k, n - 1)
    require(kk >= 1, s"need ≥2 reference points, got $n")
    val nbIdx = Array.ofDim[Int](n, kk); val nbDist = Array.ofDim[Double](n, kk)
    var i = 0
    while (i < n) {
      // k nearest of point i (selection via bounded insertion)
      val bd = Array.fill(kk)(Double.MaxValue); val bi = new Array[Int](kk)
      var j = 0
      while (j < n) {
        if (j != i) {
          val a = pts(i); val b = pts(j)
          var s = 0.0; var t = 0
          while (t < a.length) { val d0 = a(t) - b(t); s += d0 * d0; t += 1 }
          val d = math.sqrt(s)
          if (d < bd(kk - 1)) {
            var p = kk - 1
            while (p > 0 && bd(p - 1) > d) { bd(p) = bd(p - 1); bi(p) = bi(p - 1); p -= 1 }
            bd(p) = d; bi(p) = j
          }
        }
        j += 1
      }
      nbIdx(i) = bi; nbDist(i) = bd
      i += 1
    }
    val kdist = Array.tabulate(n)(i => nbDist(i)(kk - 1))
    val lrd = Array.tabulate(n) { i =>
      var reach = 0.0; var t = 0
      while (t < kk) { reach += math.max(nbDist(i)(t), kdist(nbIdx(i)(t))); t += 1 }
      1.0 / (reach / kk + 1e-10)
    }
    LofNoveltyModel(points = pts, kdist = kdist, lrd = lrd, k = kk)
  }
}

/** Constant-size broadcastable LOF novelty state (SURVEY §2.8; the
  * reference's `model_wrapper.py` scoring-path bug — returning training
  * scores for any input — is NOT replicated: this scores the rows it
  * is given, the `_decision_function` semantics). */
final case class LofNoveltyModel(points: Array[Array[Double]],
                                 kdist: Array[Double], lrd: Array[Double], k: Int) {

  /** −LOF(x) (higher = more normal, sklearn score convention) as a
    * native codegen expression (`functions.LofNoveltyScore`) — model
    * state rides as flat primitive reference arrays, the k-NN heap
    * and reach/lrd algebra run inside whole-stage codegen, and a
    * short input vector fails loudly. Bit-identical to the retired
    * UDF (`scoreColUdf`, kept for the differential spec). */
  def scoreCol(features: Column): Column = {
    require(points.nonEmpty, "lof model has no reference points")
    val dim = points(0).length
    val flat = new Array[Double](points.length * dim)
    var i = 0
    while (i < points.length) {
      System.arraycopy(points(i), 0, flat, i * dim, dim); i += 1
    }
    graft.functions.ArrayMath.lofScore(features, flat, dim, kdist, lrd, k)
  }

  /** The original UDF scorer — retained ONLY as the differential
    * reference for NativeExprSpec (proves `scoreCol`'s codegen path
    * bit-identical); not used by any query path. */
  private[graft] def scoreColUdf(features: Column): Column = {
    val pts = points; val kd = kdist; val lr = lrd; val kk = k
    val f = udf { (x: Seq[Double]) =>
      val xa = x.toArray
      val n = pts.length
      val heapD = new Array[Double](kk); val heapI = new Array[Int](kk)
      var filled = 0
      var i = 0
      while (i < n) {
        val p = pts(i)
        var s = 0.0; var j = 0
        while (j < p.length) { val d0 = xa(j) - p(j); s += d0 * d0; j += 1 }
        val d = math.sqrt(s)
        if (filled < kk) {
          heapD(filled) = d; heapI(filled) = i; filled += 1
          if (filled == kk) { // build max-heap
            var m = kk / 2 - 1
            while (m >= 0) { siftDown(heapD, heapI, m, kk); m -= 1 }
          }
        } else if (d < heapD(0)) {
          heapD(0) = d; heapI(0) = i; siftDown(heapD, heapI, 0, kk)
        }
        i += 1
      }
      val m = filled
      var reachSum = 0.0; var lrdSum = 0.0
      var t = 0
      while (t < m) {
        val o = heapI(t)
        reachSum += math.max(heapD(t), kd(o))
        lrdSum += lr(o)
        t += 1
      }
      val lrdX = 1.0 / (reachSum / m + 1e-10)
      -(lrdSum / m) / lrdX
    }
    f(features)
  }

  private def siftDown(d: Array[Double], ix: Array[Int], start: Int, len: Int): Unit = {
    var root = start
    while (2 * root + 1 < len) {
      var child = 2 * root + 1
      if (child + 1 < len && d(child + 1) > d(child)) child += 1
      if (d(root) >= d(child)) return
      val td = d(root); d(root) = d(child); d(child) = td
      val ti = ix(root); ix(root) = ix(child); ix(child) = ti
      root = child
    }
  }
}
