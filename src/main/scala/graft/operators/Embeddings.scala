package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
