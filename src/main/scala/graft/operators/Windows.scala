package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators.
  *
  * Reference: pandas `groupby(...).transform('mean'/'count')` in
  * `python_scoring/train.py:47-53` — a group aggregate broadcast back to
  * every row (row count preserved). Spark-native form is an unbounded
  * window over the group key.
  *
  * Scale note: a partition-only window (no orderBy) shuffles once on the
  * key and needs no sort; skewed keys are handled by AQE. When the same
  * key is used by a later join, the exchange is reused.
  */
object Windows {

  /** `groupby(key).transform('mean')` → group mean on every row. */
  def withGroupMean(df: DataFrame, key: String, valueCol: String, out: String): DataFrame =
    df.withColumn(out, avg(col(valueCol)).over(Window.partitionBy(col(key))))

  /** `groupby(key).transform('count')` → group size on every row. */
  def withGroupCount(df: DataFrame, key: String, out: String): DataFrame =
    df.withColumn(out, count(lit(1)).over(Window.partitionBy(col(key))))

  /** Latest-row-per-key dedup: `row_number() over (partition by key order
    * by ts desc, tiebreak desc) = 1`. Needed because the reference data has
    * non-unique transaction ids (SURVEY §1.3); `tiebreak` keeps the result
    * deterministic when timestamps collide. */
  def latestPerKey(df: DataFrame, key: String, tsCol: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol).desc, col(tiebreak).desc)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Top-k by score (descending), deterministic via unique tiebreak —
    * `ORDER BY score DESC LIMIT k` → Spark `TakeOrderedAndProject`, which
    * takes k per partition then merges on the driver: no full sort, no
    * full shuffle, safe at any scale for small k. */
  def topK(df: DataFrame, scoreCol: String, tiebreak: String, k: Int): DataFrame =
    df.orderBy(col(scoreCol).desc, col(tiebreak).asc).limit(k)
}
