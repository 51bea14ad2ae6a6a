package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators a large event pipeline needs beyond the
  * reference's own surface: gap-based sessionization and as-of joins.
  * Both are single-shuffle shapes — partition by the entity key, sort
  * by time within the partition, never a per-row subquery or an
  * inequality join (which Spark would plan as BroadcastNestedLoop).
  *
  * Reference tie-in: the reference's per-customer "recent activity"
  * reads (`api/app.py:123-128` 90-day lookback per transaction) are
  * point-in-time lookups; `joinAsOf` is the set-oriented form that
  * answers all of them in one pass.
  */
object Temporal {

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same entity exceeds `gapSeconds`. Adds
    * `session_id` (1-based per entity, by time order).
    *
    * Shape: one shuffle on `keyCol`, one intra-partition sort — the
    * running `sum(is_break)` and the `lag` share the same window, so
    * Catalyst plans a single Window node. At 100 TB sessions never
    * cross the key boundary, so the shuffle is the only data movement;
    * skewed entities are split by AQE.
    *
    * `tiebreak` makes the order total when timestamps collide (the
    * testdata has unique event ids; production streams often don't have
    * unique timestamps). */
  def withSessionId(df: DataFrame, keyCol: String, tsCol: String,
                    tiebreak: String, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tiebreak))
    val prevTs = lag(col(tsCol), 1).over(order)
    val isBreak = when(prevTs.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prevTs) > gapSeconds * 1000000L, 1)
      .otherwise(0)
    df.withColumn("session_id",
      sum(isBreak).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"))
  }

  /** Per-session rollup: (key, session_id, n_events, start/end epoch µs,
    * total value). Epoch-micros longs rather than timestamps keep the
    * output engine-portable (naive vs tz-aware timestamp types differ
    * across engines; int64 doesn't). */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tiebreak: String,
                 valueCol: String, gapSeconds: Long): DataFrame =
    withSessionId(df, keyCol, tsCol, tiebreak, gapSeconds)
      .groupBy(col(keyCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(unix_micros(col(tsCol))).as("start_us"),
           max(unix_micros(col(tsCol))).as("end_us"),
           round(sum(col(valueCol)), 6).as("total_value"))

  /** Range (interval) join: pair each point with every interval
    * containing it — `start ≤ point ≤ end`, all three numeric (e.g.
    * epoch µs). A naive inequality join plans as BroadcastNestedLoop
    * (O(|points|·|intervals|)); this binned form stays an EQUI-join:
    * each interval explodes to the `⌈len/binSize⌉` bins it overlaps,
    * each point maps to its one bin, bins equi-join (shuffle or
    * broadcast — Catalyst's choice), and the exact containment
    * predicate filters at the join. A point's bin is unique, so every
    * matching (point, interval) pair meets exactly once — no dedup
    * pass.
    *
    * `binSize` trades interval fan-out (len/binSize copies) against
    * join selectivity (points per bin); set it near the typical
    * interval length. At 100 TB the bin key shuffles, AQE splits hot
    * bins, and the interval side usually broadcasts (intervals ≪
    * points). Column names of `points` and `intervals` must be
    * disjoint. */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      binSize: Long): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    val overlap = points.columns.toSet intersect intervals.columns.toSet
    require(overlap.isEmpty, s"point/interval column collision: $overlap")
    val binned = intervals.withColumn("__bin",
      explode(sequence(expr(s"$startCol div $binSize"), expr(s"$endCol div $binSize"))))
    val p = points.withColumn("__bin", expr(s"$pointCol div $binSize"))
    p.join(binned, Seq("__bin"))
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bin")
  }

  /** As-of join: for every left row, the latest right row of the same
    * key with `right.tsCol` STRICTLY before `left.tsCol` (the
    * point-in-time lookup semantic — a feature store read, a
    * slowly-changing-dimension join).
    *
    * Implementation is the union + carry-forward pattern, NOT a range
    * join: both sides are tagged and unioned, shuffled ONCE on the key,
    * sorted by (ts, side, payload), and `last(payload, ignoreNulls)`
    * over the unbounded-preceding frame carries the most recent right
    * payload onto each left row. Right rows at the exact left timestamp
    * sort AFTER left rows (side 0 < 1), so "strictly before" holds; ties
    * among right rows resolve deterministically by the payload struct
    * ordering. Cost is one exchange + one sort regardless of how many
    * right rows precede each left row — an inequality join would be
    * O(|left|·|right|) per key.
    *
    * Returns the left rows + `matchedCols` from the right (null when no
    * right row precedes). */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               leftTs: String, rightTs: String,
               matchedCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(matchedCols.nonEmpty, "matchedCols must name ≥1 right column")
    // Internal scratch names and output-collision guards — a silent
    // collision would produce ambiguous/duplicate output columns
    // (rangeJoinBinned and StreamJoin.intervalJoin guard the same way).
    val reserved = Set("__ts", "__side", "__p", "__l", "__m")
    val usedReserved = (left.columns ++ right.columns).filter(reserved).toSet
    require(usedReserved.isEmpty,
      s"input columns collide with joinAsOf internals: $usedReserved")
    val matchedClash = matchedCols.toSet intersect leftCols.toSet
    require(matchedClash.isEmpty,
      s"matchedCols collide with left columns: $matchedClash")
    val payload = struct(matchedCols.map(col): _*)
    val l = left.select(
      keyCols.map(col) :+ col(leftTs).as("__ts") :+ lit(0).as("__side") :+
        lit(null).cast(right.select(payload).schema.head.dataType).as("__p") :+
        struct(leftCols.map(col): _*).as("__l"): _*)
    val r = right.select(
      keyCols.map(col) :+ col(rightTs).as("__ts") :+ lit(1).as("__side") :+
        payload.as("__p") :+ lit(null).cast(l.select(col("__l")).schema.head.dataType).as("__l"): _*)
    val order = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(order))
      .filter(col("__side") === 0)
    matched.select(
      leftCols.map(c => col("__l").getField(c).as(c)) ++
        matchedCols.map(c => col("__m").getField(c).as(c)): _*)
  }
}
