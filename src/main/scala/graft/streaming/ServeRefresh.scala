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
  * GENERIC over the index tier (r8): `RefreshableIndex[S]` holds any
  * shard type behind the same versioned swap, with `rawIndex` /
  * `sqIndex` / `pqIndex` constructors for the three serving tiers —
  * the refresh/versioning/idempotence contract is one implementation,
  * not three copies. PQ refreshes refit the codebooks with the shard
  * (codes from one version's model are meaningless under another's —
  * the model IS part of the version).
  *
  * 100 TB posture: refresh cost is the shard fit (bounded by the
  * `fitShard`/`fitShards` caps); the stream never pauses because the
  * fit happens OFF the streaming thread and the swap is one reference
  * write. Output is written per batch-id directory with overwrite, so
  * a replayed batch after a crash lands idempotently (the same
  * exactly-once contract as the scored-events file runner). */
object ServeRefresh {

  /** The hot-swappable versioned index over any shard type. `refresh`
    * fits a new shard from the (current) corpus frame and bumps the
    * version; readers snapshot (version, shard) in one volatile
    * read. */
  final class RefreshableIndex[S](fit: DataFrame => S) {
    @volatile private[this] var cur: (Int, S) = _

    /** Fit a new shard and swap it in; returns the new version. */
    def refresh(corpus: DataFrame): Int = synchronized {
      val v = Option(cur).map(_._1 + 1).getOrElse(1)
      cur = (v, fit(corpus))
      v
    }

    def currentVersion: Int = snapshot._1

    private[graft] def snapshot: (Int, S) = {
      val c = cur
      require(c != null, "RefreshableIndex: refresh() before serving")
      c
    }
  }

  /** Raw-double exact tier (`AnnShard`). */
  def rawIndex(idCol: String = "vec_id", vecCol: String = "embedding")
      : RefreshableIndex[AnnServe.AnnShard] =
    new RefreshableIndex(c => AnnServe.fitShard(c, idCol, vecCol))

  /** SQ8 byte tier (`SqShard`) — 8× less resident vector RAM, same
    * refresh contract. */
  def sqIndex(idCol: String = "vec_id", vecCol: String = "embedding")
      : RefreshableIndex[AnnServe.SqShard] =
    new RefreshableIndex(c => AnnServe.fitSqShard(c, idCol, vecCol))

  /** Graph-beam tier (`GraphShard`) — the kNN graph is REBUILT with
    * the shard each refresh (IVF-bounded `Ivf.knnGraph` construction,
    * the declared queries' operator): a version is (vectors, graph,
    * entry points) together, the same all-or-nothing rule as the PQ
    * tier's codebooks. A long-running service maintaining the graph
    * incrementally uses `GraphStream.MaintainedGraph.serveBeamSnapshot`
    * instead — this constructor is the refit-from-corpus spelling. */
  def graphIndex(k: Int = 8, idCol: String = "vec_id",
                 vecCol: String = "embedding")
      : RefreshableIndex[AnnServe.GraphShard] =
    new RefreshableIndex(c => {
      val graph = graft.operators.Ivf.knnGraph(c, idCol, vecCol, k)
      AnnServe.fitGraphShard(c, graph, idCol, vecCol)
    })

  /** PQ tier (`PqShard`) — model refit WITH the shard each refresh;
    * a version is (codebooks, codes) together. */
  def pqIndex(m: Int = 16, ksub: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding")
      : RefreshableIndex[AnnServe.PqShard] =
    new RefreshableIndex(c => {
      val model = graft.operators.Pq.fit(c, idCol, vecCol, m, ksub)
      AnnServe.fitPqShard(c, model, idCol, vecCol)
    })

  /** Serve a query stream against the refreshable index: per batch,
    * one snapshot read, one row-local serve pass (`serve`), answers
    * tagged with the serving version and written idempotently per
    * batch id. */
  def start[S](index: RefreshableIndex[S], queries: DataFrame,
               outDir: String, checkpoint: String)
              (serve: (DataFrame, S) => DataFrame): StreamingQuery =
    queries.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val (v, shard) = index.snapshot
        serve(batch, shard)
          .withColumn("index_version", lit(v))
          .write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The raw-tier runner with the r7 signature (row-local exact
    * top-k). */
  def start(index: RefreshableIndex[AnnServe.AnnShard], queries: DataFrame,
            k: Int, outDir: String, checkpoint: String,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): StreamingQuery =
    start(index, queries, outDir, checkpoint)(
      (batch, shard) => AnnServe.topkRows(batch, shard, k, idCol, vecCol))
}
