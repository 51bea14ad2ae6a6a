package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — how the data is ARRANGED on storage is a
  * first-class scale lever at 100 TB: parquet row-group min/max
  * pruning only helps when rows with similar key values are physically
  * adjacent, and a single-column sort buys locality in one dimension
  * only. Z-ordering (Morton codes) interleaves the bits of several
  * key columns so one sort key preserves locality in ALL of them —
  * range predicates on any interleaved dimension prune most files.
  * (The same layout trick behind Delta/Iceberg OPTIMIZE ZORDER,
  * expressed here as plain Spark.)
  */
object Layout {

  /** Morton z-value: interleave the low `bitsPer` bits of each column
    * (clamped into [0, 2^bitsPer)), column i owning bit positions
    * b·n + i. Pure codegen bit arithmetic (disjoint bits, so the sum
    * IS the bitwise-or) — engine-portable, oracle-recomputable. */
  def zValue(cols: Seq[Column], bitsPer: Int): Column = {
    val n = cols.size
    require(n >= 1 && bitsPer >= 1 && n * bitsPer <= 63,
      s"need 1 <= n*bitsPer <= 63, got n=$n bitsPer=$bitsPer")
    val mask = (1L << bitsPer) - 1
    val clamped = cols.map(c => c.cast("long").bitwiseAND(lit(mask)))
    val terms = for {
      b <- 0 until bitsPer
      (c, ci) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + ci)
    terms.reduce(_ + _)
  }

  /** Physically cluster a frame by the z-value of `keyCols`: range-
    * partition on zval (contiguous z-ranges per output file), sort
    * within partitions. Each written file then covers a small
    * hyper-rectangle of the key space, so min/max stats are tight on
    * EVERY key column and a predicate on any of them prunes files.
    * LayoutSpec quantifies the locality vs an unclustered layout. */
  def zOrderBy(df: DataFrame, keyCols: Seq[String], bitsPer: Int,
               numPartitions: Int): DataFrame = {
    val z = zValue(keyCols.map(col), bitsPer).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
