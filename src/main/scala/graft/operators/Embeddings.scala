package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorOps

/** Whole-corpus embedding statistics — the vector-column analogs of the
  * dataset-card rollups in `Corpus`: class prototypes (centroids),
  * which downstream feed classifier initialization, cluster seeding
  * (`Ivf.fit` starts from exactly this shape) and per-class drift
  * monitoring.
  */
object Embeddings {

  /** Per-group embedding centroid, emitted as exploded (grp, dim_idx,
    * centroid) scalars — the same output convention as `ml_preproc`
    * (array columns are unsortable in the verify harness, and the
    * exploded form is what a SQL engine can re-derive).
    *
    * Shape: posexplode is scan-side (fan-out = the fixed dimension),
    * then ONE partial+final hash agg keyed by (group, dim) — the
    * shuffle carries #groups × dims rows of scalar sums, never
    * vectors. At 100 TB this is the map-side-combine ideal: each task
    * contributes one partial (sum, count) per (group, dim). */
  def centroids(vectors: DataFrame, groupCol: String, vecCol: String): DataFrame =
    vectors.select(col(groupCol).as("grp"),
        posexplode(col(vecCol).cast("array<double>")))
      .groupBy("grp", "pos")
      .agg(round(avg(col("col")), 6).as("centroid"),
           count(lit(1)).cast("int").as("n_vectors"))
      .select(col("grp"), col("pos").cast("int").as("dim_idx"),
              col("centroid"), col("n_vectors"))
      .orderBy("grp", "dim_idx")

  /** The SQ8 round trip: quantize `f` through the per-dim affine line
    * (min + code·step, code = clamp(floor((x−min)/step + 0.5))) and
    * dequantize back — the EXACT algebra the serve tier ships
    * (`AnnServe.fitSqShard` / the `sim_sq_topk` oracle), shared by the
    * batch distortion query (line attached as a broadcast 1-row frame)
    * and its streaming twin (line inlined as literal arrays), so the
    * two spellings cannot drift. */
  def sqRoundTrip(f: Column, minl: Column, stepl: Column): Column =
    transform(f, (x, i) => {
      val mn = minl(i)
      val st = stepl(i)
      when(st === 0, mn).otherwise(
        mn + least(lit(255.0), greatest(lit(0.0),
          floor((x - mn) / st + lit(0.5)).cast("double"))) * st)
    })

  /** Per-vector SQ8 distortion columns: L2 reconstruction error and
    * cosine fidelity of the round trip, rounded to the engine-portable
    * 6 decimals. Pure scan-side expressions. */
  def sqDistortionCols(f: Column, minl: Column, stepl: Column)
      : (Column, Column) = {
    val g = sqRoundTrip(f, minl, stepl)
    (round(sqrt(aggregate(
       zip_with(f, g, (a, b) => (a - b) * (a - b)),
       lit(0.0), (acc, x) => acc + x)), 6),
     round(VectorOps.cosine(f, g), 6))
  }

  /** Diversified top-k retrieval: cosine top-k with an at-most-
    * `perCell` quota per semantic cell — the result-diversity move a
    * retrieval layer makes so k near-identical chunks don't crowd out
    * the answer (the quota form of MMR, relational instead of greedy-
    * iterative). Cells here are the deterministic unit-normalized grid
    * of `Dedup.semanticDedupGrid` (oracle-provable); the production
    * swap is the IVF cell id the corpus already carries — same plan,
    * coarser cells.
    *
    * Shape: scoring is the brute-force broadcast pattern (bounded
    * query sets by contract); the quota is a rank window keyed by
    * (query, cell) and the final cut a rank window keyed by query —
    * both windows run on the scored frame, whose size is
    * |queries| × |corpus| only in the brute-force baseline; with IVF
    * cells the candidate frame is already cell-pruned. */
  def topkDiverse(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  queryIdCol: String, queryVecCol: String,
                  k: Int = 10, perCell: Int = 2,
                  gridDims: Int = 2, gridSize: Double = 0.25,
                  excludeSelf: Boolean = true): DataFrame = {
    // excludeSelf compares neighbor and query ids — correct when the
    // queries ARE corpus rows (the self-query idiom); pass false when
    // the two frames have unrelated id spaces, or an unlucky id
    // equality would silently drop a legitimate neighbor
    require(k >= 1 && perCell >= 1 && gridDims >= 1 && gridSize > 0)
    val v = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("f"))
      .withColumn("__n", sqrt(VectorOps.dot(col("f"), col("f"))))
      .filter(col("__n") > 0)
      .withColumn("cell", concat_ws(",", (1 to gridDims).map(d =>
        floor(element_at(col("f"), d) / col("__n") / lit(gridSize))
          .cast("long").cast("string")): _*))
    val q = queries.select(col(queryIdCol).as("query_id"),
      col(queryVecCol).cast("array<double>").as("qv"))
    val joinCond =
      if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true)
    val scored = v.join(broadcast(q), joinCond)
      .select(col("query_id"), col("neighbor_id"), col("cell"),
        round(VectorOps.cosine(col("qv"), col("f")), 6).as("cos"))
    val wCell = Window.partitionBy("query_id", "cell")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    val wAll = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("cell_rank", row_number().over(wCell))
      .filter(col("cell_rank") <= perCell)
      .withColumn("__rn", row_number().over(wAll)).filter(col("__rn") <= k)
      .drop("__rn")
      .orderBy("query_id", "neighbor_id")
  }
}
