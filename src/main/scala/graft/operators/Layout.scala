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

  /** Deterministic training-epoch shuffle — the order a corpus is FED
    * to the trainer: each epoch gets an independent pseudo-random
    * permutation, materialized as (epoch, shard, pos, doc_id) so a
    * data loader reads its shard sequentially and the global order is
    * reproducible bit-for-bit (re-runs resume mid-epoch, two trainers
    * see identical batches). No RNG anywhere: the per-(epoch, doc)
    * md5 key IS the permutation (the `cellCap` hash-order discipline),
    * the shard is the key's leading 24 bits mod `nShards` (so shard
    * membership is a pure per-row function — re-sharding never moves
    * with partition layout), and `pos` ranks (key, doc_id) within the
    * (epoch, shard).
    *
    * Scale shape: key and shard are scan-side expressions; the only
    * wide op is the per-(epoch, shard) rank — `nShards` independent
    * window partitions of |corpus|/nShards rows each, sorting spilled
    * externally. Size `nShards` to the cluster (thousands at 100 TB)
    * and each window partition is a few GB; a strictly-global
    * sequence number instead would be the two-level prefix-sum
    * (`Corpus.tokenBudget`'s shape) — per-shard order is what a
    * sharded data loader actually consumes. */
  def epochShuffle(docs: DataFrame, idCol: String, epochs: Int = 2,
                   nShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochs >= 1 && nShards >= 1, s"bad epochs=$epochs nShards=$nShards")
    val key = md5(concat(lit("ep"), col("epoch").cast("string"), lit(":"),
      col("doc_id").cast("string")).cast("binary"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .withColumn("epoch", explode(array((0 until epochs).map(lit): _*)))
      .withColumn("__k", key)
      .withColumn("shard",
        (conv(substring(col("__k"), 1, 6), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard")
          .orderBy(col("__k"), col("doc_id"))).cast("int"))
      .select("epoch", "shard", "pos", "doc_id")
  }

  /** Source-INTERLEAVED epoch shuffle — `epochShuffle` with a batch-
    * diversity guarantee: within each (epoch, shard) the sources
    * round-robin (every source's hash-first doc, then every source's
    * second, ...), so a sequential reader never sees a long
    * single-source run even when one source dominates the corpus —
    * the homogeneous-batch failure mode of naive shuffles. Two
    * windows: the per-(epoch, shard, source) rank, then the
    * (rank, source)-ordered position within (epoch, shard); both
    * partitions are |corpus|/nShards-bounded. */
  def epochInterleave(docs: DataFrame, idCol: String, sourceCol: String,
                      epochs: Int = 2, nShards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epochs >= 1 && nShards >= 1, s"bad epochs=$epochs nShards=$nShards")
    val key = md5(concat(lit("ep"), col("epoch").cast("string"), lit(":"),
      col("doc_id").cast("string")).cast("binary"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        col(sourceCol).as("source"))
      .withColumn("epoch", explode(array((0 until epochs).map(lit): _*)))
      .withColumn("__k", key)
      .withColumn("shard",
        (conv(substring(col("__k"), 1, 6), 16, 10).cast("long") % nShards)
          .cast("int"))
      .withColumn("__r", row_number().over(
        Window.partitionBy("epoch", "shard", "source")
          .orderBy(col("__k"), col("doc_id"))))
      .withColumn("pos", row_number().over(
        Window.partitionBy("epoch", "shard")
          .orderBy(col("__r"), col("source"), col("doc_id"))).cast("int"))
      .select("epoch", "shard", "pos", "doc_id", "source")
  }
}
