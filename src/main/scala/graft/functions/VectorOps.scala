package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<numeric>` columns via Spark higher-order
  * functions (`zip_with` / `aggregate`) — fully codegen'd Catalyst
  * expressions, no UDFs, no JVM-object round trips.
  *
  * Reference: per-row reconstruction MSE `np.mean(np.square(X - recon),
  * axis=1)` (`python_scoring/model_wrapper.py:44-49`, `app1.py:81`).
  * All arithmetic is cast to double first so results are stable across
  * float32-encoded parquet inputs (e.g. `embeddings.embedding`).
  */
object VectorOps {

  private def d(c: Column): Column = c.cast("double")

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖); 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Per-row mean squared error between two equal-length vectors:
    * mean((x - recon)²). */
  def rowwiseMse(x: Column, recon: Column): Column = {
    val sq = zip_with(x, recon, (a, b) => (d(a) - d(b)) * (d(a) - d(b)))
    aggregate(sq, lit(0.0), (acc, v) => acc + v) / size(x).cast("double")
  }

  /** Mean squared magnitude: mse(x, 0). */
  def meanSquare(x: Column): Column =
    aggregate(x, lit(0.0), (acc, v) => acc + d(v) * d(v)) / size(x).cast("double")
}
