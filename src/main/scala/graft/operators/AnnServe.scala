package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The SERVE half of the similarity family: a query-vector FEED scored
  * against a fitted in-memory index shard, row-locally — no join, no
  * shuffle, no state, so a live stream of queries is answered at scan
  * speed (the `fitNbQuality`/`fitFuzzyKeys` fit/serve pattern applied
  * to ANN, and the Spark analog of how vector-search engines actually
  * serve: index shards resident in RAM on each serving node, queries
  * fanned out over them).
  *
  * Scale shape: the SHARD is the bounded quantity — at 100 TB the
  * corpus is partitioned into shards sized to executor memory, each
  * serving task holds one, and a per-query top-k merge combines shard
  * answers (identical to the IVF probe's cell merge). The query side
  * is the unbounded one and is never collected. For corpus-side scale
  * WITHIN one Spark job, the LSH/IVF/PQ paths (`sim_lsh_topk`,
  * `sim_ivf_topk`, `sim_pq_topk`) remain the candidates-first answer;
  * this path is exact and shard-bounded. Fidelity: the serve output is
  * bit-identical to the batch `q_sim_bruteforce` join+window plan (the
  * expression ranks on HALF_UP-6dp-rounded cosine with the same
  * tie-break), so the same DuckDB oracle hash-checks both, and the
  * streaming twin's drained end state equals the batch answer
  * row-for-row. */
object AnnServe {

  /** One in-memory index shard: ids + row-major vectors (doubles, the
    * same float→double cast the batch plan applies). Constant-size per
    * SHARD by deployment contract — see the class doc; the driver-side
    * collect here is the shard build, bounded by the same executor-
    * memory sizing that bounds every broadcast model in this repo. */
  final case class AnnShard(ids: Array[Long], flatVecs: Array[Double], dim: Int) {
    require(dim > 0 && flatVecs.length == ids.length * dim,
      s"AnnShard: ${flatVecs.length} values for ${ids.length} ids at dim $dim")
    // cached broadcast handle (one serialization per shard per session;
    // transient so the persisted artifact stays plain arrays). The
    // broadcast carries the precomputed norms too — fitted once here,
    // never per task.
    @transient private var bc:
        org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Double], Array[Double])] = _
    private[graft] def broadcastWith(sc: org.apache.spark.SparkContext):
        org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Double], Array[Double])] =
      synchronized {
        if (bc == null) {
          val n = ids.length
          val norms = new Array[Double](n)
          var i = 0
          while (i < n) {
            var s = 0.0; var j = 0
            while (j < dim) { val v = flatVecs(i * dim + j); s += v * v; j += 1 }
            norms(i) = math.sqrt(s); i += 1
          }
          bc = sc.broadcast((ids, flatVecs, norms))
        }
        bc
      }
  }

  /** Build the shard from an embeddings frame. `rowCap` is the loud
    * scale guard: a shard is memory-resident by design, so exceeding
    * the cap is a deployment error (shard the corpus and merge
    * per-query answers), never something to let `collect()` discover
    * as an executor OOM. The default bounds a float64×64-dim shard at
    * ~0.5 GB. */
  def fitShard(embeddings: DataFrame, idCol: String = "vec_id",
               vecCol: String = "embedding",
               rowCap: Int = 1 << 20): AnnShard = {
    // bounded probe (scans at most rowCap+1 rows), so the guard fires
    // before any corpus-sized driver materialization is attempted
    require(embeddings.limit(rowCap + 1).count() <= rowCap,
      s"AnnShard: embeddings exceed the per-shard cap $rowCap — an ANN " +
        "serve shard must fit serving-node memory; partition the corpus " +
        "into shards and merge per-query top-k answers instead")
    val rows = embeddings
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
    require(rows.nonEmpty, "AnnShard: empty embeddings frame")
    val dim = rows(0).getSeq[Double](1).length
    val ids = new Array[Long](rows.length)
    val flat = new Array[Double](rows.length * dim)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).getLong(0)
      val v = rows(i).getSeq[Double](1)
      require(v.length == dim,
        s"AnnShard: ragged vector at ${ids(i)} (${v.length} vs $dim)")
      var j = 0
      while (j < dim) { flat(i * dim + j) = v(j); j += 1 }
      i += 1
    }
    AnnShard(ids, flat, dim)
  }

  /** Exact top-k cosine per query row against the shard — one native
    * codegen expression (`functions.CosineTopK`), exploded to
    * (query_id, neighbor_id, cos) rows. Works identically on batch and
    * streaming frames (stateless append). */
  def topkRows(queries: DataFrame, shard: AnnShard, k: Int = 10,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame =
    queries
      .select(col(idCol).cast("long").as("query_id"),
        explode(graft.functions.ArrayMath.cosineTopK(
          col(idCol), col(vecCol),
          shard.broadcastWith(queries.sparkSession.sparkContext),
          shard.dim, k))
          .as("__nb"))
      .select(col("query_id"), col("__nb.neighbor_id").as("neighbor_id"),
              col("__nb.cos").as("cos"))

  /** The MEMORY-bound serve shard: PQ byte codes instead of raw
    * doubles — m bytes/vector vs dim·8 (64-dim/m=8 ⇒ 64× less shard-vector
    * RAM), the trade that decides how much corpus one serving node
    * holds (Jégou 2011). Codes come from `Pq.encode` itself, so shard
    * contents are definitionally the batch index's codes. */
  final case class PqShard(ids: Array[Long], flatCodes: Array[Byte],
                           model: Pq.Model) {
    require(flatCodes.length == ids.length * model.m,
      s"PqShard: ${flatCodes.length} codes for ${ids.length} ids at m=${model.m}")
    @transient private var bc:
        org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Byte])] = _
    private[graft] def broadcastWith(sc: org.apache.spark.SparkContext):
        org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Byte])] =
      synchronized {
        if (bc == null) bc = sc.broadcast((ids, flatCodes))
        bc
      }
  }

  /** Encode the corpus with the fitted PQ model and collect the
    * (id, codes) table as a flat byte shard. Same `rowCap` contract as
    * `fitShard`; the cap buys 64× more vectors here because each row
    * is m bytes. */
  def fitPqShard(embeddings: DataFrame, model: Pq.Model,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 rowCap: Int = 1 << 26): PqShard = {
    require(model.ksub <= 256,
      s"PqShard: byte codes need ksub <= 256, got ${model.ksub}")
    require(embeddings.limit(rowCap + 1).count() <= rowCap,
      s"PqShard: embeddings exceed the per-shard cap $rowCap — partition " +
        "the corpus into shards and merge per-query top-k answers instead")
    val rows = Pq.encode(embeddings, idCol, vecCol, model).collect()
    require(rows.nonEmpty, "PqShard: empty embeddings frame")
    val ids = new Array[Long](rows.length)
    val codes = new Array[Byte](rows.length * model.m)
    var i = 0
    while (i < rows.length) {
      ids(i) = rows(i).getLong(0)
      val cs = rows(i).getSeq[Int](1)
      require(cs.length == model.m,
        s"PqShard: ragged codes at ${ids(i)} (${cs.length} vs ${model.m})")
      var s = 0
      while (s < model.m) { codes(i * model.m + s) = cs(s).toByte; s += 1 }
      i += 1
    }
    PqShard(ids, codes, model)
  }

  /** ADC top-k per query row against the PQ shard — one native codegen
    * expression (`functions.AdcTopK`): per-query LUT build + m table
    * lookups per corpus vector, ranked on rounded approximate squared
    * distance. Bit-identical to the batch `Pq.topk` join+window plan
    * (SimilaritySpec). Stateless — batch and append-mode streaming
    * alike. */
  def pqTopkRows(queries: DataFrame, shard: PqShard, k: Int = 10,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    val m = shard.model
    val flatBooks = new Array[Double](m.m * m.ksub * m.dsub)
    var s = 0
    while (s < m.m) {
      var c = 0
      while (c < m.ksub) {
        var j = 0
        while (j < m.dsub) {
          flatBooks((s * m.ksub + c) * m.dsub + j) = m.codebooks(s)(c)(j); j += 1
        }
        c += 1
      }
      s += 1
    }
    queries
      .select(col(idCol).cast("long").as("query_id"),
        explode(graft.functions.ArrayMath.adcTopK(
          col(idCol), col(vecCol),
          shard.broadcastWith(queries.sparkSession.sparkContext), flatBooks,
          m.m, m.ksub, m.dsub, k)).as("__nb"))
      .select(col("query_id"), col("__nb.neighbor_id").as("neighbor_id"),
              col("__nb.approx_sqdist").as("approx_sqdist"))
  }
}
