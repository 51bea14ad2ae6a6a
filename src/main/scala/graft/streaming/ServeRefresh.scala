package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.AnnServe

/** Serve-tier INDEX REFRESH — the piece that makes the ANN serve tier
  * a long-running service instead of a one-shot job: the corpus grows
  * while the query stream runs, so the resident index shard must be
  * re-fit on a cadence and swapped in WITHOUT stopping the stream or
  * mixing versions inside a batch.
  *
  * Mechanism: the fitted shard lives behind one volatile reference
  * versioned by fit count. Each micro-batch reads the reference ONCE
  * at batch start (`foreachBatch` body), so a `refresh` between
  * batches takes effect atomically at the next batch boundary — batch
  * N scores wholly against index vN, batch N+1 wholly against vN+1,
  * never a blend. The swapped-out shard's broadcast is unpersisted
  * lazily by the JVM (handles are per-shard; a shard still referenced
  * by an in-flight batch keeps working). Every answer row carries the
  * serving `index_version`, making per-batch-version parity checkable
  * against the batch oracle for that version's corpus (StreamingSpec
  * pins this exactly).
  *
  * 100 TB posture: refresh cost is the shard fit (bounded by the
  * `fitShard`/`fitShards` caps); the stream never pauses because the
  * fit happens OFF the streaming thread and the swap is one reference
  * write. Output is written per batch-id directory with overwrite, so
  * a replayed batch after a crash lands idempotently (the same
  * exactly-once contract as the scored-events file runner). */
object ServeRefresh {

  /** The hot-swappable versioned index. `refresh` fits a new shard
    * from the (current) corpus frame and bumps the version; readers
    * snapshot (version, shard) in one volatile read. */
  final class RefreshableIndex(idCol: String = "vec_id",
                               vecCol: String = "embedding") {
    @volatile private[this] var cur: (Int, AnnServe.AnnShard) = _

    /** Fit a new shard and swap it in; returns the new version. */
    def refresh(corpus: DataFrame): Int = synchronized {
      val v = Option(cur).map(_._1 + 1).getOrElse(1)
      cur = (v, AnnServe.fitShard(corpus, idCol, vecCol))
      v
    }

    def currentVersion: Int = snapshot._1

    private[graft] def snapshot: (Int, AnnServe.AnnShard) = {
      val c = cur
      require(c != null, "RefreshableIndex: refresh() before serving")
      c
    }
  }

  /** Serve a query stream against the refreshable index: per batch,
    * one snapshot read, one row-local serve pass, answers tagged with
    * the serving version and written idempotently per batch id. */
  def start(index: RefreshableIndex, queries: DataFrame, k: Int,
            outDir: String, checkpoint: String,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (v, shard) = index.snapshot
        AnnServe.topkRows(batch, shard, k, idCol, vecCol)
          .withColumn("index_version", lit(v))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
}
