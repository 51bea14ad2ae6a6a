package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector

/** Reconstruction-error anomaly scorer — the principled distributed
  * substitution for the reference's Keras dense autoencoder
  * (`train.py:18-28,80-88`; SURVEY §2.8 `ml_autoencoder`): a linear
  * autoencoder trained by SVD (MLlib PCA) instead of SGD. Identical
  * semantics — per-row reconstruction MSE as the anomaly score, P97.5
  * validation threshold — with a deterministic, shuffle-light trainer.
  *
  * Scoring is a deterministic Scala UDF over the broadcast component
  * matrix (k·d doubles — constant-size model state, SURVEY §4.3);
  * everything else stays declarative.
  */
final case class PcaReconModel(components: Array[Array[Double]], d: Int, k: Int) {

  /** score = ‖x − V Vᵀ x‖² / d  (per-row mean squared reconstruction
    * error, `model_wrapper.py:44-49`). */
  def scoreCol(features: Column): Column = {
    val comp = components // (k rows, each of length d)
    val dd = d
    val f = udf { (x: Seq[Double]) =>
      val xa = x.toArray
      val proj = new Array[Double](comp.length)
      var j = 0
      while (j < comp.length) {
        val row = comp(j); var i = 0; var s = 0.0
        while (i < dd) { s += row(i) * xa(i); i += 1 }
        proj(j) = s; j += 1
      }
      var err = 0.0; var i = 0
      while (i < dd) {
        var r = 0.0; var jj = 0
        while (jj < comp.length) { r += comp(jj)(i) * proj(jj); jj += 1 }
        val e = xa(i) - r; err += e * e; i += 1
      }
      err / dd
    }
    f(features)
  }
}

object PcaRecon {

  /** Fit top-k principal components of `featuresCol` (array<double>).
    * MLlib PCA computes the covariance spectrum distributed; only the
    * d×k component matrix comes back to the driver. */
  def fit(df: DataFrame, featuresCol: String, k: Int): PcaReconModel = {
    val vecDf = df.select(array_to_vector(col(featuresCol)).as("__v"))
    val model = new PCA().setInputCol("__v").setOutputCol("__p").setK(k).fit(vecDf)
    val pc = model.pc // d rows × k cols, column-major
    val d = pc.numRows
    val comps = Array.tabulate(k) { j => Array.tabulate(d) { i => pc(i, j) } }
    PcaReconModel(comps, d, k)
  }
}
