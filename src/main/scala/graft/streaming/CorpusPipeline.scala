package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.operators.Dedup

/** The CONTINUOUS-CORPUS flagship — "the product" as a long-running
  * service: document+embedding batches arrive as a stream and ONE
  * maintained state advances per micro-batch through the composed
  * pipeline
  *
  *   incremental near-dup dedup  →  kept-set diff  →  kNN-graph
  *   (minhash bands vs standing     (insert new        upsert + serve
  *    corpus, verified jaccard,      keepers, EVICT     swap
  *    CC min-id keep rule)           dethroned ones)   (`MaintainedGraph`)
  *
  * The keep rule is the CLUSTER-MIN-ID rule of the batch
  * `q_corpus_dedup`/`q_dedup_clusters` family — deliberately, because
  * it is ORDER-FREE: near-dup clusters only grow as docs arrive and
  * min(cluster) only falls, so the drained end state equals the batch
  * dedup of the full corpus REGARDLESS of arrival order, and the
  * chained DuckDB oracle (minhash-md5 pairs → recursive-CTE closure →
  * keep → exact kNN graph over keepers) applies verbatim to the end
  * state. The price of order-freedom is RETRACTION: a late-arriving
  * smaller-id member dethrones the standing keeper of its cluster,
  * and the graph absorbs that as a delete+insert in the same batch —
  * which is exactly what `MaintainedGraph.advance` provides (kept →
  * evicted happens at most once per doc; an evicted doc can never be
  * re-kept because the dethroning smaller id stays in its cluster).
  *
  * Incrementality: per batch, ONLY candidate pairs touching the batch
  * are generated (batch bands joined against all bands — standing ×
  * standing pairs were generated when their younger member arrived),
  * and the graph never re-pays old×old (the `knnGraphIncremental`
  * contract). The per-batch O(n) terms — re-shingling the corpus for
  * verification sets and the state snapshots — are scan-side and
  * write-side respectively, the same simplest-correct snapshot
  * posture as `GraphStream` (production persists banded keys and
  * shingle sets bucketed; the pair/graph algebra is unchanged).
  * No bucket cap and no stop-shingle df filter in this twin: both are
  * corpus-frequency-dependent and therefore arrival-order-dependent —
  * the capped/filtered forms stay the batch production path with
  * their own oracles.
  *
  * Crash contract: the embedded graph commits first (idempotent by
  * batchId), the corpus state commits second, the corpus POINTER
  * last — a replayed batch recomputes the same survivors from the
  * pre-batch corpus state and the graph advance no-ops. */
object CorpusPipeline {

  /** The maintained deduped corpus + its kNN graph + serve versioning,
    * recoverable from `stateDir` alone. */
  final class MaintainedCorpus(spark: SparkSession, stateDir: String,
                               k: Int = 5,
                               numHashes: Int = 16, bands: Int = 8,
                               threshold: Double = 0.1,
                               shingleK: Int = 3,
                               stateFormat: String = "snapshot",
                               compactEvery: Int = 4) {
    require(stateFormat == "snapshot" || stateFormat == "upsertlog",
      s"MaintainedCorpus: unknown stateFormat '$stateFormat'")
    require(compactEvery >= 2, s"compactEvery=$compactEvery must be >= 2")
    new java.io.File(stateDir).mkdirs()
    // the embedded graph adopts the same state spelling — one format
    // decision for the whole pipeline's persistence
    val graph = new GraphStream.MaintainedGraph(
      spark, s"$stateDir/graph", k, idCol = "doc_id", vecCol = "embedding",
      stateFormat = stateFormat, compactEvery = compactEvery)
    @volatile private var cur: (Int, Long) = readPointer().getOrElse((0, -1L))
    // committed state stays HOT (localCheckpoint blocks); parquet
    // snapshots are the recovery path only — same posture and same
    // rationale as `MaintainedGraph.hot`
    @volatile private var hot: Option[(Int, DataFrame, DataFrame, DataFrame)] = None
    // DERIVED hot state: the standing shingle-set and banded-key
    // tables. A doc's shingles/bands never change, so these append
    // per batch (each batch's slice is its own localCheckpoint; the
    // standing table is their lazy union) — computed once at arrival,
    // never an O(corpus) re-derive. Deterministic functions of `docs`,
    // so they are NOT persisted: a recovered process re-derives them
    // from the docs snapshot once. At production scale they'd be
    // bucketed tables keyed on (band, bh) / doc_id; the per-batch
    // algebra is identical.
    @volatile private var hotDerived: Option[(Int, DataFrame, DataFrame)] = None

    def version: Int = cur._1
    def lastAppliedBatchId: Long = cur._2

    /** The committed (docs, pairs, kept) frames at the current
      * version — hot blocks if this process committed them. A
      * RECOVERED process reads the parquet snapshot ONCE and
      * `localCheckpoint`s it into hot blocks BEFORE anything downstream
      * builds on it: `advance` chains `unionByName` on these frames and
      * the retention loop deletes `v=newV-2`, so a LAZY read of the
      * recovered `v=N` would still be referenced by the hot chain two
      * commits after a restart — the snapshot write of `v=N+3` would
      * then scan a deleted directory and die (the recovery lineage bug
      * the r9 kill/restart test exposed). Same posture as the
      * `hotDerived` recovery branch and `MaintainedGraph.commit`, which
      * cut lineage eagerly for the same reason. */
    private def hotState: (DataFrame, DataFrame, DataFrame) = synchronized {
      require(version > 0, "MaintainedCorpus: no committed version yet")
      hot match {
        case Some((v, d, p, kp)) if v == version => (d, p, kp)
        case _ =>
          val (d, p, kp) =
            if (stateFormat == "snapshot")
              (spark.read.parquet(s"$stateDir/docs/v=$version").localCheckpoint(),
               spark.read.parquet(s"$stateDir/pairs/v=$version").localCheckpoint(),
               spark.read.parquet(s"$stateDir/kept/v=$version").localCheckpoint())
            else reconstruct(version)
          hot = Some((version, d, p, kp))
          (d, p, kp)
      }
    }

    /** Snapshot versions present on disk (the `docs/v=N` dirs). */
    private def snapshotVersions(): Seq[Int] =
      Option(new java.io.File(s"$stateDir/docs").listFiles())
        .getOrElse(Array.empty).toSeq
        .flatMap(f => scala.util.Try(f.getName.stripPrefix("v=").toInt).toOption)

    /** Upsert-log recovery: newest snapshot at-or-below `v`, then replay
      * segments in version order — docs and pairs are APPEND-only (the
      * corpus store's invariant, so a segment is just the batch's rows
      * and its new pairs); the kept set applies its per-batch diff
      * (evictions out, fresh keepers in). One lineage cut at the end. */
    private def reconstruct(v: Int): (DataFrame, DataFrame, DataFrame) = {
      val snaps = snapshotVersions().filter(_ <= v)
      require(snaps.nonEmpty,
        s"MaintainedCorpus: no snapshot at or below v=$v under $stateDir")
      val s0 = snaps.max
      var d = spark.read.parquet(s"$stateDir/docs/v=$s0")
      var p = spark.read.parquet(s"$stateDir/pairs/v=$s0")
      var kp = spark.read.parquet(s"$stateDir/kept/v=$s0")
      ((s0 + 1) to v).foreach { lv =>
        val seg = s"$stateDir/log/v=$lv"
        d = d.unionByName(spark.read.parquet(s"$seg/dins"))
        p = p.unionByName(spark.read.parquet(s"$seg/pins"))
        kp = kp.join(spark.read.parquet(s"$seg/kout"), Seq("doc_id"), "left_anti")
          .unionByName(spark.read.parquet(s"$seg/kin"))
      }
      (d.localCheckpoint(), p.localCheckpoint(), kp.localCheckpoint())
    }

    /** All docs seen so far: (doc_id, text, embedding). */
    def docs: DataFrame = hotState._1

    /** Verified near-dup pairs accumulated so far. */
    def pairs: DataFrame = hotState._2

    /** The kept (deduped) doc ids at the current version. */
    def kept: DataFrame = hotState._3

    /** Absorb one micro-batch of (doc_id, text, embedding) rows.
      * Returns the corpus version serving after this batch. */
    def advance(batchId: Long, batch: DataFrame): Int = synchronized {
      val (v, last) = cur
      if (batchId <= last) return v
      // A file-sourced micro-batch arrives as ONE input partition, so
      // without the repartition every per-batch scan-side stage — the
      // md5-minhash shingle/band pass above all — runs on one core
      // (r15 profile: corpus:shingle-band was the heaviest phase at
      // 2.4 s of 11 s of job time, single-threaded). Row placement is
      // irrelevant to every downstream aggregate/join, so spreading
      // the batch across the session's shuffle width only adds one
      // tiny exchange and parallelizes the whole batch pipeline.
      val nPart = spark.sessionState.conf.numShufflePartitions
      val b = graft.Phases.phase(spark, "corpus:batch-in") {
        batch.select(col("doc_id").cast("long").as("doc_id"),
          col("text"), col("embedding").cast("array<double>").as("embedding"))
          .repartition(nPart)
          .localCheckpoint()
      }
      if (graft.Phases.phase(spark, "corpus:batch-in")(b.limit(1).count()) == 0) {
        writePointer(v, batchId); cur = (v, batchId); return v
      }
      val (docs0, pairs0, kept0) =
        if (v == 0) {
          val empty = b.filter(lit(false))
          (empty,
           spark.createDataFrame(
             spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
             org.apache.spark.sql.types.StructType(Seq(
               org.apache.spark.sql.types.StructField("doc_a",
                 org.apache.spark.sql.types.LongType),
               org.apache.spark.sql.types.StructField("doc_b",
                 org.apache.spark.sql.types.LongType),
               org.apache.spark.sql.types.StructField("jaccard",
                 org.apache.spark.sql.types.DoubleType)))),
           empty.select(col("doc_id")))
        } else (docs, pairs, kept.select("doc_id"))
      require(v == 0 ||
          graft.Phases.phase(spark, "corpus:guard")(
            docs0.join(b, Seq("doc_id"), "left_semi").limit(1).count()) == 0,
        "MaintainedCorpus: batch re-sends an already-seen doc_id — " +
          "the corpus store is append-only; dedup decides keeps, not re-sends")
      // append-only accumulation: the standing frames are lazy unions
      // of per-batch localCheckpoint blocks — no O(corpus)
      // re-materialization per batch; the parquet snapshot below is
      // the only whole-corpus scan, and it reads hot blocks
      val allDocs = docs0.unionByName(b)
      // ---- derived state: shingle/band the BATCH only, append
      // lazy checkpoints (r15): both frames materialize inside the
      // first consumer job (the candidate-pair stage) instead of two
      // standalone per-batch jobs; blocks still cache for every later
      // batch's shAll/bandAll union
      val (shB, bandB) = graft.Phases.phase(spark, "corpus:shingle-band") {
        val s = Dedup.shingleDocs(b, "doc_id", "text", shingleK)
          .localCheckpoint(false)
        (s, Dedup.bandedKeys(s, numHashes, bands, portableMd5 = true)
          .localCheckpoint(false))
      }
      val (shAll, bandAll) = hotDerived match {
        case Some((v0, s0, b0)) if v0 == v && v > 0 =>
          (s0.unionByName(shB), b0.unionByName(bandB))
        case _ if v == 0 => (shB, bandB)
        case _ =>
          // recovered process: re-derive the standing tables from the
          // docs snapshot ONCE; subsequent batches append again
          graft.Phases.phase(spark, "corpus:shingle-band") {
            val sh0 = Dedup.shingleDocs(docs0, "doc_id", "text", shingleK)
              .localCheckpoint()
            val b0 = Dedup.bandedKeys(sh0, numHashes, bands, portableMd5 = true)
              .localCheckpoint()
            (sh0.unionByName(shB), b0.unionByName(bandB))
          }
      }
      // batch docs are NEW ids (the append-only guard above), so a new
      // pair always touches the batch and can never duplicate a
      // standing pair — dedup within the batch's candidates suffices
      val newPairs = graft.Phases.phase(spark, "corpus:pairs") {
        CorpusPipeline
          .incrementalPairsFrom(shAll, bandAll, bandB, threshold)
          .localCheckpoint(false)
      }
      val pairs1 = pairs0.unionByName(newPairs)
      // ---- kept set: cluster-min-id over the accumulated pairs
      val kept1 = graft.Phases.phase(spark, "corpus:cc-kept") {
        val nonSurvivors = Dedup.connectedComponents(pairs1, "doc_a", "doc_b")
          .filter(col("is_survivor") === 0).select(col("node").as("doc_id"))
        allDocs.select("doc_id")
          .join(nonSurvivors, Seq("doc_id"), "left_anti").localCheckpoint(false)
      }
      // ---- diff → graph upsert (evictions are deletes, new keepers
      // inserts; an evicted id was kept before, so it is indexed) —
      // the graph's advance collects the eviction set driver-side
      // anyway, so it owns the empty/nonempty decision
      val evicted = kept0.join(kept1, Seq("doc_id"), "left_anti")
      val fresh = kept1.join(kept0, Seq("doc_id"), "left_anti")
      val freshEmb = allDocs.join(fresh, Seq("doc_id"), "left_semi")
        .select("doc_id", "embedding")
      graph.advance(batchId, freshEmb, Some(evicted)): Unit
      // ---- corpus commit (pointer last — the batch's commit marker);
      // writes scan hot blocks, not recomputed lineage. Two spellings
      // behind the same pointer contract (mirror of MaintainedGraph):
      // "snapshot" writes the full state per batch; "upsertlog" writes
      // the per-batch DELTA — the batch's docs, its new pairs and the
      // kept-set diff, ALL already computed by the advance algebra
      // above, so the segment costs zero extra compute and O(|batch|)
      // write I/O instead of O(corpus) — with a full snapshot every
      // `compactEvery` versions bounding recovery replay.
      val newV = v + 1
      val snapVersions =
        if (stateFormat == "snapshot") Nil
        else snapshotVersions().filter(_ <= v)
      val snapNow = stateFormat == "snapshot" || snapVersions.isEmpty ||
        newV - snapVersions.max >= compactEvery
      // independent state writes run concurrently (guide §2.6) — the
      // driver was the only thing serializing them
      if (snapNow) {
        deleteDir(s"$stateDir/log/v=$newV"): Unit
        graft.Phases.inParallel(spark, "corpus:snapshot-write")(
          () => allDocs.write.mode("overwrite").parquet(s"$stateDir/docs/v=$newV"),
          () => pairs1.write.mode("overwrite").parquet(s"$stateDir/pairs/v=$newV"),
          () => kept1.write.mode("overwrite").parquet(s"$stateDir/kept/v=$newV"))
      } else {
        Seq("docs", "pairs", "kept").foreach(kind =>
          deleteDir(s"$stateDir/$kind/v=$newV"): Unit)
        val seg = s"$stateDir/log/v=$newV"
        graft.Phases.inParallel(spark, "corpus:log-write")(
          () => b.write.mode("overwrite").parquet(s"$seg/dins"),
          () => newPairs.write.mode("overwrite").parquet(s"$seg/pins"),
          () => fresh.write.mode("overwrite").parquet(s"$seg/kin"),
          () => evicted.write.mode("overwrite").parquet(s"$seg/kout"))
      }
      writePointer(newV, batchId)
      hot = Some((newV, allDocs, pairs1, kept1))
      hotDerived = Some((newV, shAll, bandAll))
      cur = (newV, batchId)
      if (stateFormat == "snapshot") {
        Seq("docs", "pairs", "kept").foreach { kind =>
          var old = newV - 2
          while (old >= 1 && deleteDir(s"$stateDir/$kind/v=$old")) old -= 1
        }
      } else if (snapNow) {
        // log retention at compaction: v=newV-1 reconstructs from the
        // PREVIOUS snapshot plus its trailing segments
        snapVersions.sorted.lastOption.foreach { p =>
          snapVersions.filter(_ < p).foreach { s =>
            Seq("docs", "pairs", "kept").foreach(kind =>
              deleteDir(s"$stateDir/$kind/v=$s"): Unit)
          }
          (1 to p).foreach(s => deleteDir(s"$stateDir/log/v=$s"): Unit)
        }
      }
      newV
    }

    private def pointerPath = java.nio.file.Paths.get(s"$stateDir/POINTER")

    private def readPointer(): Option[(Int, Long)] =
      if (!java.nio.file.Files.exists(pointerPath)) None
      else {
        val parts = new String(java.nio.file.Files.readAllBytes(pointerPath),
          java.nio.charset.StandardCharsets.UTF_8).trim.split(" ")
        require(parts.length == 2,
          s"MaintainedCorpus: corrupt pointer ${parts.toSeq} at $pointerPath")
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

  /** The incremental pair stage of one micro-batch — candidates
    * TOUCHING the batch only (the BATCH's banded keys joined against
    * the standing band table; standing × standing pairs were generated
    * when their younger member arrived), verified with exact jaccard
    * over the portable string shingle sets. The shingle/band frames
    * are the maintained DERIVED state: a doc's shingles and bands
    * never change, so they are computed once at arrival and the
    * standing tables only append — the per-batch cost is O(|batch|)
    * band compute plus the candidate join, never an O(corpus)
    * re-shingle. Factored out so PlanShapeSpec can gate the composed
    * micro-batch plan on exactly this frame: the candidate join must
    * hash-partition on the (band, bh) key only — never a cartesian. */
  private[graft] def incrementalPairsFrom(shAll: DataFrame, bandAll: DataFrame,
                                          bandBatch: DataFrame,
                                          threshold: Double): DataFrame = {
    val cands = bandBatch.as("a").join(bandAll.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val withSets = cands
      .join(shAll.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(shAll.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
    val inter = size(array_intersect(col("sa"), col("sb"))).cast("double")
    val un = (size(col("sa")) + size(col("sb"))).cast("double") - inter
    withSets
      .select(col("doc_a"), col("doc_b"), round(inter / un, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Drive a (doc_id, text, embedding) stream through the maintained
    * corpus: one `advance` per micro-batch. */
  def start(corpus: MaintainedCorpus, feed: DataFrame,
            checkpoint: String): StreamingQuery =
    feed.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        corpus.advance(batchId, batch): Unit
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()

  /** The declared `q_continuous_corpus` runner: documents joined with
    * their embeddings, hash-sliced into `nSlices` arrival files (order
    * is IRRELEVANT to the end state — the cluster-min-id keep rule and
    * the exact graph are both arrival-order-free), streamed one file
    * per micro-batch through the full pipeline. Drained end state =
    * the exact top-k graph over the batch-deduped corpus, which the
    * chained DuckDB oracle re-derives from scratch. */
  def continuousOverFile(spark: SparkSession, sfDir: String,
                         k: Int = 5, nSlices: Int = 4,
                         stateFormat: String = "snapshot",
                         compactEvery: Int = 4): DataFrame = {
    val feed = graft.Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      .join(graft.Tables.embeddings(spark, sfDir)
        .select(col("vec_id").as("doc_id"),
          col("embedding").cast("array<double>").as("embedding")),
        Seq("doc_id"))
    val root = java.nio.file.Files.createTempDirectory("graft_corpuspipe").toString
    val in = s"$root/in"
    val mc = new MaintainedCorpus(spark, s"$root/state", k,
      stateFormat = stateFormat, compactEvery = compactEvery)
    // test-scale runner tuning only (the drainToTable rule): each
    // micro-batch chains many SMALL state jobs, and 32 shuffle
    // partitions plus per-stage AQE re-planning per tiny stage is pure
    // scheduler overhead; the operator itself takes the session
    // default untouched
    ScoreStream.withConfs(spark, "spark.sql.shuffle.partitions" -> "8",
                          "spark.sql.adaptive.enabled" -> "false") {
      // stage the join ONCE (lazy hot blocks) — the old loop re-ran
      // the documents⋈embeddings join per slice. The writes stay
      // SEQUENTIAL: they append to one directory, and concurrent jobs
      // would race on its shared _temporary staging dir.
      val staged = feed.localCheckpoint(false)
      (0 until nSlices).foreach { s =>
        staged.filter(pmod(xxhash64(col("doc_id")), lit(nSlices)) === s)
          .coalesce(1).write.mode("append").parquet(in)
      }
      val q = start(mc,
        spark.readStream.schema(feed.schema).option("maxFilesPerTrigger", 1).parquet(in),
        s"$root/ckpt")
      q.awaitTermination()
    }
    // pin the result into hot blocks, then reclaim the temp root
    // (state snapshots there hold multiple full corpus copies per run)
    val out = mc.graph.edges.orderBy("query_id", "neighbor_id").localCheckpoint()
    GraphStream.deleteRecursively(root)
    out
  }
}
