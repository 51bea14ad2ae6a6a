package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the one Structured
  * Streaming primitive the rest of the streaming surface doesn't
  * exercise: BOTH sides are unbounded, so each side must buffer rows
  * in the state store until the other side's watermark proves no
  * future match can arrive.
  *
  * The join condition is `key equality AND |rightTs − leftTs| ≤
  * tolerance`; the time-range bound is what lets Spark compute a state
  * eviction horizon per side (watermark − tolerance). NB: an INNER
  * stream-stream join without that bound is ACCEPTED by the engine and
  * silently buffers both sides forever (only outer/semi variants are
  * rejected) — the bound here is load-bearing for memory, not just
  * semantics. State per key is bounded by (rate × (delay +
  * tolerance)), independent of stream length — the 100 TB/day posture.
  *
  * Reference tie-in: the gateway zips request rows with ML-worker
  * score rows arriving asynchronously (`api/app.py:234`); this is that
  * pairing done honestly on unbounded streams — each side tolerates
  * the other being `tolerance` late/early instead of assuming
  * positional alignment.
  */
object StreamJoin {

  /** Inner interval join. Column names of the two sides must be
    * disjoint (rename before calling); `keyExpr` is the equality
    * predicate, e.g. `col("user_id") === col("score_user_id")`. */
  def intervalJoin(left: DataFrame, leftTs: String,
                   right: DataFrame, rightTs: String,
                   keyExpr: Column, toleranceSeconds: Long,
                   watermarkDelay: String = "10 minutes"): DataFrame = {
    require(toleranceSeconds >= 0,
      s"toleranceSeconds must be >= 0, got $toleranceSeconds (negative makes the interval unsatisfiable)")
    val overlap = left.columns.toSet intersect right.columns.toSet
    require(overlap.isEmpty, s"stream-join column collision: $overlap")
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(r, keyExpr &&
      col(rightTs) >= col(leftTs) - expr(s"INTERVAL $toleranceSeconds SECONDS") &&
      col(rightTs) <= col(leftTs) + expr(s"INTERVAL $toleranceSeconds SECONDS"))
  }
}
