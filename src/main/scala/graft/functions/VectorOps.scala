package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<numeric>` columns, backed by the
  * native codegen expressions in `ArrayMath` (a tight primitive loop
  * in whole-stage codegen — Spark's own `zip_with`/`aggregate` HOFs
  * are interpreted and ~40× slower on these hot paths).
  *
  * Reference: per-row reconstruction MSE `np.mean(np.square(X - recon),
  * axis=1)` (`python_scoring/model_wrapper.py:44-49`, `app1.py:81`).
  * Inputs implicit-cast to `array<double>`, and accumulation is
  * left-to-right — bit-identical to the DuckDB
  * `list_sum(list_transform(...))` oracle formulations.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ */
  def dot(a: Column, b: Column): Column = ArrayMath.dot(a, b)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a, b) = a·b / (‖a‖‖b‖); 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Per-row mean squared error between two equal-length vectors:
    * mean((x - recon)²). */
  def rowwiseMse(x: Column, recon: Column): Column =
    ArrayMath.sqDiffSum(x, recon) / size(x).cast("double")

  /** Mean squared magnitude: mse(x, 0). */
  def meanSquare(x: Column): Column = dot(x, x) / size(x).cast("double")
}
