package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature preprocessing replicating the reference's ColumnTransformer
  * (`python_scoring/preprocessing.py:8-23`, fit `train.py:64-69`):
  * StandardScaler(withMean, withStd) over the numeric columns and a
  * dense OneHotEncoder(handle_unknown='ignore') over the categoricals,
  * concatenated as [scaled numerics ++ raw one-hot] — sklearn scales the
  * numerics only, the OHE block stays 0/1 (SURVEY §2.8).
  *
  * Spark-first design: the fitted model is a handful of scalars (means,
  * population stddevs — sklearn divides by n, not n-1 — and sorted
  * category vocabularies), so transform is pure `Column` arithmetic into
  * an `array<double>` — fully codegen'd, no UDF, no MLlib vector
  * interop, no shuffle. Fit is one distributed aggregate plus one small
  * distinct per categorical (constant-size model state collected to the
  * driver, like sklearn's `categories_`).
  */
final case class PreprocModel(
    numeric: Seq[(String, Double, Double)],      // (col, mean, std — 0-guarded to 1)
    cats: Seq[(String, Seq[String])]) {          // (col, sorted vocab)

  def featureNames: Seq[String] =
    numeric.map(_._1) ++ cats.flatMap { case (c, vs) => vs.map(v => s"$c=$v") }

  def dim: Int = numeric.size + cats.map(_._2.size).sum

  /** Append `outputCol` as array<double>: scaled numerics ++ one-hot. */
  def transform(df: DataFrame, outputCol: String = "features"): DataFrame = {
    val scaled: Seq[Column] = numeric.map { case (c, mean, std) =>
      (coalesce(col(c).cast("double"), lit(0.0)) - lit(mean)) / lit(std)
    }
    val onehot: Seq[Column] = cats.flatMap { case (c, vocab) =>
      // NULL categoricals were fitted into the "" vocab slot (fit
      // coalesces before collect_set) — transform must coalesce the same
      // way or NULL rows one-hot to all-zeros instead of hitting "".
      vocab.map(v => when(coalesce(col(c).cast("string"), lit("")) === v, 1.0).otherwise(0.0))
    }
    df.withColumn(outputCol, array(scaled ++ onehot: _*))
  }
}

object Preproc {

  /** ONE aggregate over the data (map-side combined; the shuffle
    * carries a single row): numeric means + population stddevs and the
    * categorical vocabularies (`collect_set` — bounded by category
    * cardinality, like sklearn's `categories_`) all in the same pass. */
  def fit(df: DataFrame, numericCols: Seq[String], catCols: Seq[String]): PreprocModel = {
    val numAggs = numericCols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}__mean"), stddev_pop(col(c)).as(s"${c}__std")))
    val catAggs = catCols.map(c =>
      collect_set(coalesce(col(c).cast("string"), lit(""))).as(s"${c}__vocab"))
    val aggs = numAggs ++ catAggs
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val numeric = numericCols.zipWithIndex.map { case (c, i) =>
      val mean = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val std0 = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      val std = if (std0 == 0.0 || std0.isNaN) 1.0 else std0   // sklearn: zero-variance -> scale 1
      (c, mean, std)
    }
    val base = 2 * numericCols.size
    val cats = catCols.zipWithIndex.map { case (c, i) =>
      (c, row.getSeq[String](base + i).sorted.toSeq)
    }
    PreprocModel(numeric, cats)
  }
}
