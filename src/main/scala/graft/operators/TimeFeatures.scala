package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Calendar feature extraction.
  *
  * Reference: `python_scoring/train.py:38-43`, `api/app.py:55-62` — parse an
  * ISO-8601 UTC timestamp and derive `year, month, day_of_week, hour`.
  *
  * Semantic trap (SURVEY.md §2.6): pandas `dayofweek` is Monday=0..Sunday=6
  * while Spark's `dayofweek` is Sunday=1..Saturday=7. We use Spark's
  * `weekday()` (Monday=0) to preserve the reference semantics exactly.
  *
  * All pure `Column` arithmetic — stays inside whole-stage codegen.
  */
object TimeFeatures {

  def yearCol(ts: Column): Column = year(ts)
  def monthCol(ts: Column): Column = month(ts)
  /** Monday=0..Sunday=6, matching pandas `Series.dt.dayofweek`. */
  def dayOfWeekCol(ts: Column): Column = weekday(ts)
  def hourCol(ts: Column): Column = hour(ts)

  /** Append the four calendar features (reference column names). */
  def withTimeFeatures(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol)
    df.withColumn("year", yearCol(ts))
      .withColumn("month", monthCol(ts))
      .withColumn("day_of_week", dayOfWeekCol(ts))
      .withColumn("hour", hourCol(ts))
  }

  /** Missing timestamp → features default to 0 (`api/app.py:156-159`):
    * the reference keeps scoring a transaction whose timestamp failed to
    * parse, with all calendar features zeroed. */
  def withTimeFeatureDefaults(df: DataFrame, tsCol: String): DataFrame = {
    val ts = col(tsCol)
    df.withColumn("year", coalesce(year(ts), lit(0)))
      .withColumn("month", coalesce(month(ts), lit(0)))
      .withColumn("day_of_week", coalesce(weekday(ts), lit(0)))
      .withColumn("hour", coalesce(hour(ts), lit(0)))
  }
}
