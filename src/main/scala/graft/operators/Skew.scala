package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling join utilities for the 100 TB posture (SURVEY §7.4):
  * when one join key dominates (a whale customer), a plain shuffle
  * join sends that key's entire volume to one task. AQE's skew-join
  * split handles sort-merge cases automatically; `saltedJoin` is the
  * explicit fallback for aggregation-followed-by-join pipelines and
  * for engines/configs where AQE can't split (e.g. bucketed inputs).
  *
  * Shape: the big side gets a random salt in [0, buckets); the small
  * side is replicated `buckets` times (explode of a literal range —
  * tiny, it's the dimension side); the join key becomes (key, salt),
  * spreading each hot key over `buckets` tasks.
  */
object Skew {

  /** Left-join `big` to `small` on `key`, salted `buckets` ways.
    * `small` must be the dimension side (it is replicated). Salt is
    * seeded per-row via a deterministic hash of the full row — no
    * rand(), so retried tasks produce identical output. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame = {
    require(buckets > 0)
    val saltCol = pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(buckets))
    val bigS = big.withColumn("__salt", saltCol)
    val smallS = small.withColumn("__salt",
      explode(array((0 until buckets).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "__salt"), "left").drop("__salt")
  }
}
