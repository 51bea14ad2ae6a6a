package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.AnnServe

/** STREAMING kNN-graph maintenance — the missing lifecycle seam
  * between the batch upsert operators (`AnnServe.knnGraphIncremental`
  * / `knnGraphDelete`) and the long-running-service posture the serve
  * tier already has (`ServeRefresh`): vector batches arrive as a
  * stream and the STANDING exact graph advances per micro-batch,
  * bit-identical at every version to a scratch rebuild over the
  * corpus-so-far (the exact-over-union merge property), so the
  * drained end state of `q_knn_graph_stream` is hash-checked by the
  * SAME DuckDB oracle as the batch `q_knn_graph`.
  *
  * State + recovery contract (the part `foreachBatch` does not give
  * for free): the maintained state is (corpus, edges) snapshot
  * directories versioned `v=N`, plus one POINTER file naming
  * (version, lastAppliedBatchId) that is written LAST and atomically
  * (temp + ATOMIC_MOVE) — the pointer IS the batch's commit:
  *  - crash BEFORE the pointer write → the pointer still names v=N-1;
  *    Spark replays the batch from its checkpoint and the advance
  *    recomputes v=N from v=N-1, overwriting any partial dirs
  *    idempotently;
  *  - crash AFTER the pointer but before Spark's own commit marker →
  *    the replayed batch arrives with batchId == lastAppliedBatchId
  *    and the advance is a loud no-op (the state already includes
  *    it) — exactly-once observable state, the same contract the
  *    scored-events file runner pins for its sink.
  * Only the last two versions are retained (the replay fallback needs
  * v=N-1 and nothing older).
  *
  * Cost shape per batch (the honest 100 TB posture): the graph math
  * is the incremental operators' — |old|·|new| + |new|² serve scans
  * for an insert batch, |affected|·|remaining| for a delete — and
  * NEVER re-pays old×old. The state SNAPSHOT is O(n) write per batch;
  * snapshots keep recovery trivially correct and versions fully
  * isolated, and at production scale the swap-in is a compacted
  * upsert log (the snapshot is this operator's simplest-correct
  * spelling, not an algorithmic term — the graph compute dominates
  * it at steady state). */
object GraphStream {

  /** The standing maintained graph: versioned on-disk (corpus, edges)
    * snapshots behind one in-memory (version, lastBatchId) pointer,
    * recoverable from `stateDir` alone. All mutation goes through
    * `advance`; readers (`corpus`/`edges`/`serveSnapshot`) see the
    * last committed version only — never a mid-batch blend (the
    * `ServeRefresh` atomic-at-batch-boundary rule applied to graph
    * state). */
  final class MaintainedGraph(spark: SparkSession, stateDir: String,
                              k: Int = 5,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding") {
    new java.io.File(stateDir).mkdirs()
    // (version, lastAppliedBatchId) — recovered from the pointer when
    // one exists, so a restarted process resumes the standing graph
    @volatile private var cur: (Int, Long) = readPointer().getOrElse((0, -1L))
    // The committed version stays HOT in the cluster (localCheckpoint
    // blocks); the parquet snapshot is the RECOVERY path only. Between
    // batches every reader — the next advance's fitShard collect, the
    // completeness-guard count, serve — hits the in-memory blocks
    // instead of re-listing/re-reading snapshot files, which at
    // micro-batch cadence was the dominant per-batch latency (state is
    // KB-to-MB sized; the job count, not the data, was the cost). A
    // recovered process (hot = None) reads the snapshot once and goes
    // hot again at its first commit.
    @volatile private var hot: Option[(Int, DataFrame, DataFrame)] = None
    // The fitted serve shard advances WITH the corpus, driver-side
    // (concatShards / filterShard) — a maintained index must not refit
    // its whole standing corpus from a cluster scan every micro-batch;
    // at production scale that re-collect is exactly the waste the
    // incremental operators exist to avoid, and at micro-batch cadence
    // it was the dominant per-batch latency. Refit happens ONCE after
    // recovery (hotShard = None), from the snapshot.
    @volatile private var hotShard: Option[(Int, AnnServe.AnnShard)] = None

    def version: Int = cur._1
    def lastAppliedBatchId: Long = cur._2

    /** The fitted shard behind the current version — hot if this
      * process committed it, refit from the snapshot once otherwise. */
    private def shardBehind(corpusDf: DataFrame): AnnServe.AnnShard =
      hotShard match {
        case Some((v0, s)) if v0 == version => s
        case _ =>
          val s = AnnServe.fitShard(corpusDf, idCol, vecCol)
          hotShard = Some((version, s))
          s
      }

    /** The corpus behind the current graph version. */
    def corpus: DataFrame = {
      require(version > 0, "MaintainedGraph: no committed version yet")
      hot match {
        case Some((v, c, _)) if v == version => c
        case _ => spark.read.parquet(s"$stateDir/corpus/v=$version")
      }
    }

    /** The standing exact top-k graph at the current version —
      * (query_id, neighbor_id, cos), complete and unfiltered (the
      * `knnGraphIncremental` precondition holds by construction). */
    def edges: DataFrame = {
      require(version > 0, "MaintainedGraph: no committed version yet")
      hot match {
        case Some((v, _, e)) if v == version => e
        case _ => spark.read.parquet(s"$stateDir/edges/v=$version")
      }
    }

    /** Serve a query frame against the current corpus, answers tagged
      * with the graph version they were computed at (the
      * `ServeRefresh` index_version contract). */
    def serveSnapshot(queries: DataFrame, kServe: Int = 10): DataFrame = {
      // (version, shard) resolve under the same lock `advance` commits
      // under: unsynchronized, a commit landing between reading the
      // pointer and resolving the shard would tag answers computed
      // against the NEW shard with the OLD version — a mid-batch blend
      // the contract forbids
      val (v, shard) = synchronized {
        val (v0, _) = cur
        require(v0 > 0, "MaintainedGraph: no committed version yet")
        (v0, shardBehind(corpus))
      }
      AnnServe.topkRows(queries, shard, kServe, idCol, vecCol)
        .withColumn("graph_version", lit(v))
    }

    /** Absorb one micro-batch: optional deletes first, then inserts
      * (so a re-ingested id is delete-then-insert within one batch),
      * each half the already-oracle-checked batch operator. Returns
      * the version serving after this batch. Idempotent under replay:
      * a batchId at or below the last applied one is a no-op. */
    def advance(batchId: Long, inserts: DataFrame,
                removedIds: Option[DataFrame] = None): Int = synchronized {
      val (v, last) = cur
      if (batchId <= last) return v
      val ins = inserts
        .select(col(idCol).cast("long").as(idCol),
                col(vecCol).cast("array<double>").as(vecCol))
      val nIns = ins.count()
      // removed ids come to the driver ANYWAY (every downstream use is
      // a broadcast build), so ONE collect replaces the count and also
      // feeds the driver-side shard filter
      val rm = removedIds.map(r =>
        r.select(col(r.columns.head).cast("long").as("__rid")).distinct())
      val removedSet: Set[Long] =
        rm.map(_.collect().map(_.getLong(0)).toSet).getOrElse(Set.empty)
      if (nIns == 0 && removedSet.isEmpty) {
        // an empty micro-batch advances the applied-batch pointer only
        // (the existing version dirs stay the state)
        writePointer(v, batchId)
        cur = (v, batchId)
        return v
      }
      val shardNew =
        if (nIns > 0) Some(AnnServe.fitShardPrecounted(ins, nIns, idCol, vecCol))
        else None
      if (v == 0) {
        require(removedSet.isEmpty,
          "MaintainedGraph: delete in the bootstrap batch — nothing is indexed yet")
        val shard = shardNew.get
        commit(batchId, 1, ins,
          AnnServe.topkRows(ins, shard, k, idCol, vecCol), shard)
      } else {
        val corpus0 = corpus
        val shard0 = shardBehind(corpus0)
        val edges0 = edges
        if (removedSet.nonEmpty) {
          val missing = removedSet.diff(shard0.ids.toSet)
          require(missing.isEmpty,
            s"MaintainedGraph: ${missing.size} removed ids were never " +
              s"indexed (e.g. ${missing.take(3).mkString(",")})")
        }
        if (removedSet.size == shard0.ids.length && removedSet.nonEmpty) {
          // deletes empty the standing corpus: the insert batch
          // re-bootstraps (knnGraphIncremental needs a nonempty old side)
          require(nIns > 0,
            "MaintainedGraph: delete would empty the corpus with nothing arriving")
          val shard = shardNew.get
          commit(batchId, v + 1, ins,
            AnnServe.topkRows(ins, shard, k, idCol, vecCol), shard)
        } else {
          val (corpus1, shard1, edges1) =
            if (removedSet.isEmpty) (corpus0, shard0, edges0)
            else {
              val corpusAfter = corpus0
                .join(broadcast(rm.get), col(idCol) === col("__rid"), "left_anti")
                .localCheckpoint()
              val shardAfter = AnnServe.filterShard(shard0, removedSet)
              (corpusAfter, shardAfter,
               AnnServe.knnGraphDelete(edges0, corpusAfter, shardAfter,
                   rm.get, shardAfter.ids.length.toLong,
                   removedSet.size.toLong, k, idCol, vecCol)
                 .localCheckpoint())
            }
          shardNew match {
            case None =>
              commit(batchId, v + 1, corpus1, edges1, shard1)
            case Some(sn) =>
              commit(batchId, v + 1, corpus1.unionByName(ins),
                AnnServe.knnGraphIncremental(
                  edges1.select("query_id", "neighbor_id", "cos"),
                  corpus1, shard1, ins, sn, k, idCol, vecCol),
                AnnServe.concatShards(shard1, sn))
          }
        }
      }
      cur._1
    }

    private def commit(batchId: Long, newV: Int, corpusDf: DataFrame,
                       edgesDf: DataFrame,
                       shardAfter: AnnServe.AnnShard): Unit = {
      // materialize once into hot blocks, snapshot from those blocks
      val c = corpusDf.localCheckpoint()
      val e = edgesDf.select("query_id", "neighbor_id", "cos").localCheckpoint()
      c.write.mode("overwrite").parquet(s"$stateDir/corpus/v=$newV")
      e.write.mode("overwrite").parquet(s"$stateDir/edges/v=$newV")
      writePointer(newV, batchId)
      hot = Some((newV, c, e))
      hotShard = Some((newV, shardAfter))
      cur = (newV, batchId)
      // retention: the replay fallback needs v=newV-1 only
      Seq("corpus", "edges").foreach { kind =>
        var old = newV - 2
        while (old >= 1 && deleteDir(s"$stateDir/$kind/v=$old")) old -= 1
      }
    }

    private def pointerPath = java.nio.file.Paths.get(s"$stateDir/POINTER")

    private def readPointer(): Option[(Int, Long)] =
      if (!java.nio.file.Files.exists(pointerPath)) None
      else {
        val parts = new String(java.nio.file.Files.readAllBytes(pointerPath),
          java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
        require(parts.length == 2,
          s"MaintainedGraph: corrupt pointer ${parts.toSeq} at $pointerPath")
        Some((parts(0).toInt, parts(1).toLong))
      }

    private def writePointer(v: Int, batchId: Long): Unit = {
      val tmp = java.nio.file.Paths.get(s"$stateDir/POINTER.tmp")
      java.nio.file.Files.write(tmp, s"$v $batchId".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      java.nio.file.Files.move(tmp, pointerPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    private def deleteDir(path: String): Boolean = {
      val d = new java.io.File(path)
      if (!d.exists) false
      else {
        def rec(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
          f.delete(): Unit
        }
        rec(d); true
      }
    }
  }

  /** Drive an insert-vector stream into the maintained graph: one
    * `advance` per micro-batch, the graph version moving atomically
    * at batch boundaries. AvailableNow by default (the finite-input
    * proof harness); a production feed runs the same call with a
    * processing-time trigger. */
  def start(graph: MaintainedGraph, vectors: DataFrame,
            checkpoint: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graph.advance(batchId, batch): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The declared `q_knn_graph_stream` runner: the embeddings table
    * re-staged as `nSlices` arrival files (hash-sliced — arrival
    * order is IRRELEVANT to the end state, because every advance is
    * bit-identical to a rebuild over the corpus-so-far), streamed one
    * file per micro-batch through the maintained graph. The drained
    * end state is the exact top-k graph over the full table, so the
    * batch `q_knn_graph` DuckDB oracle applies verbatim. */
  def knnGraphOverFile(spark: SparkSession, sfDir: String,
                       k: Int = 5, nSlices: Int = 4): DataFrame = {
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val root = java.nio.file.Files.createTempDirectory("graft_graphstream").toString
    val in = s"$root/in"
    val graph = new MaintainedGraph(spark, s"$root/state", k)
    // test-scale runner tuning only (the drainToTable rule): the
    // per-batch state jobs are tiny here, so 32-partition shuffles and
    // per-stage AQE re-planning are pure scheduler overhead
    ScoreStream.withConfs(spark, "spark.sql.shuffle.partitions" -> "8",
                          "spark.sql.adaptive.enabled" -> "false") {
      (0 until nSlices).foreach { s =>
        e.filter(pmod(xxhash64(col("vec_id")), lit(nSlices)) === s)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val q = start(graph,
        spark.readStream.schema(e.schema).option("maxFilesPerTrigger", 1).parquet(in),
        s"$root/ckpt")
      q.awaitTermination()
    }
    // pin the result into hot blocks, then reclaim the temp root —
    // state snapshots there can hold multiple full-corpus copies and
    // repeated declared-query runs would otherwise accumulate them
    val out = graph.edges.orderBy("query_id", "neighbor_id").localCheckpoint()
    deleteRecursively(root)
    out
  }

  private[streaming] def deleteRecursively(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rec)
      f.delete(): Unit
    }
    rec(new java.io.File(path))
  }
}
