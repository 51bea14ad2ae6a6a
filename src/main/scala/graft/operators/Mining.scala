package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pair MINING over embedding corpora — the two
  * pair-generation steps of a contrastive / translation
  * training-data pipeline (north-star LLM-data scope; the reference
  * scoring service has no mining, SURVEY §0):
  *
  *   * margin-criterion bitext mining (Artetxe & Schwenk 2019,
  *     "Margin-based Parallel Corpus Mining with Multilingual
  *     Sentence Embeddings"): mine translation pairs across two
  *     monolingual collections by scoring candidates with the RATIO
  *     margin — cos(x,y) normalized by the mean cosine of both
  *     endpoints' k-neighborhoods — which cancels the hubness that
  *     makes raw cosine thresholds unusable across languages;
  *   * label-safe hard-negative mining (the DPR / contrastive
  *     practice): for each anchor, the nearest neighbors that carry a
  *     DIFFERENT label inside the exact top-k window — near enough to
  *     be hard, label-filtered so known positives can't leak in as
  *     false negatives.
  *
  * Both compose the ANN serve machinery (`AnnServe.fitShard` +
  * row-local exact `topkRows`): NO all-pairs join anywhere — every
  * frame after the serve pass is bounded by |queries| · k, and the
  * only shuffles are group-bys/joins keyed on ids over those bounded
  * frames. At 100 TB the serve side shards exactly like the
  * retrieval tier (`fitShards`/`topkRowsSharded` — bit-identical
  * answers, so the mining algebra is unchanged).
  *
  * Determinism contract: `topkRows` ranks on HALF_UP-rounded cosine
  * with (cos desc, id asc) tie-break, and every derived score here is
  * rounded to 6 before its final ordering — so output is
  * hash-reproducible by a DuckDB oracle running the same algebra on
  * brute-force candidates.
  */
object Mining {

  /** Forward-mined bitext pairs: for every src row its best-margin tgt
    * candidate among its exact top-k tgt neighbors, where
    * margin(x,y) = cos(x,y) / ((avgK(x) + avgK(y)) / 2), avgK(x) the
    * mean cos of x's top-k tgt neighbors and avgK(y) of y's top-k src
    * neighbors (the "ratio" margin of Artetxe & Schwenk §3.1; both
    * directions' neighborhoods are needed, which is why the backward
    * serve pass exists). A non-positive mean neighborhood (possible
    * only on adversarial corpora — cosines can be negative) pins the
    * margin to 0 rather than dividing by it, identically on both
    * engines. Output: (src_id, tgt_id, cos, margin), one row per src,
    * margin-descending candidates resolved (margin desc, tgt_id asc).
    *
    * Id spaces are INDEPENDENT across the two collections (ADVICE
    * r10): `topkRows` excludes neighbor_id == query_id (the self-hit
    * guard for same-collection serves), which would silently drop a
    * legitimate cross-collection candidate whenever a src and tgt row
    * happen to share an id value. So both sides are served under an
    * internal disjoint remap — src ids ride as 2·id, tgt ids as
    * 2·id+1 (parity keeps the spaces disjoint and preserves each
    * side's id ORDER, so the tgt_id-asc tie-break is unchanged) — and
    * the output maps back to the callers' original ids. Ids must fit
    * in 62 bits for the doubling; enforced per row inside the remap.
    */
  // raiseError inside a when() keeps the guard row-local and
  // codegen'd — no extra validation job over either collection.
  private def remap(df: DataFrame, parity: Int, idCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val guarded = when(id >= lit(Long.MaxValue / 4) || id <= lit(Long.MinValue / 4),
        raise_error(concat(lit(s"bitextMine: $idCol out of 62-bit remap range: "),
                           id.cast("string"))).cast("long"))
      .otherwise(id * 2 + parity)
    df.withColumn(idCol, guarded)
  }

  def bitextMine(src: DataFrame, tgt: DataFrame, k: Int,
                 idCol: String = "vec_id",
                 vecCol: String = "embedding"): DataFrame = {
    require(k >= 1, s"k=$k")
    val src2 = remap(src, 0, idCol)
    val tgt2 = remap(tgt, 1, idCol)
    val tgtShard = AnnServe.fitShard(tgt2, idCol, vecCol)
    val srcShard = AnnServe.fitShard(src2, idCol, vecCol)
    val fwd = AnnServe.topkRows(src2, tgtShard, k, idCol, vecCol)
      .select(col("query_id").as("src_id"),
              col("neighbor_id").as("tgt_id"), col("cos"))
    val bwd = AnnServe.topkRows(tgt2, srcShard, k, idCol, vecCol)
    val avgSrc = fwd.groupBy("src_id").agg(avg("cos").as("avg_src"))
    val avgTgt = bwd.groupBy(col("query_id").as("tgt_id"))
      .agg(avg("cos").as("avg_tgt"))
    val denom = (col("avg_src") + col("avg_tgt")) / lit(2.0)
    val scored = fwd
      .join(avgSrc, "src_id")
      .join(avgTgt, "tgt_id")
      .withColumn("margin",
        when(denom > 0.0, round(col("cos") / denom, 6)).otherwise(0.0))
    val w = Window.partitionBy("src_id")
      .orderBy(col("margin").desc, col("tgt_id").asc)
    scored.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      // shiftright (not `/`) so the un-map stays in 64-bit integer
      // arithmetic — double division would lose precision above 2^53.
      // Both operands are even, so the arithmetic shift is exact.
      .select(shiftright(col("src_id"), 1).as("src_id"),
              shiftright(col("tgt_id") - 1, 1).as("tgt_id"),
              col("cos"), col("margin"))
  }

  /** Label-safe hard negatives: each anchor's nearest DIFFERENT-label
    * neighbors inside its exact top-k window (self excluded by the
    * serve expression), re-ranked 1..m after the same-label drop.
    * "Inside the top-k window" is the semantics, not an
    * approximation — negatives are only HARD if they're near, and the
    * label filter is what keeps known positives from leaking in as
    * false negatives. Output: (anchor_id, neg_id, cos, rank), at most
    * m rows per anchor. `labels` must carry (idCol, labelCol) for
    * every corpus row; anchors missing a label keep ALL neighbors
    * (null-safe inequality), loudly documented rather than silently
    * dropped. */
  def hardNegatives(anchors: DataFrame, corpus: DataFrame, labels: DataFrame,
                    k: Int, m: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    require(k >= 1 && m >= 1 && m <= k, s"k=$k m=$m")
    val shard = AnnServe.fitShard(corpus, idCol, vecCol)
    val topk = AnnServe.topkRows(anchors, shard, k, idCol, vecCol)
      .select(col("query_id").as("anchor_id"),
              col("neighbor_id").as("neg_id"), col("cos"))
    val lab = labels.select(col(idCol).cast("long").as("__lid"),
                            col(labelCol).as("__lab"))
    val filtered = topk
      .join(lab.withColumnRenamed("__lid", "anchor_id")
               .withColumnRenamed("__lab", "__alab"), Seq("anchor_id"), "left")
      .join(lab.withColumnRenamed("__lid", "neg_id")
               .withColumnRenamed("__lab", "__nlab"), Seq("neg_id"), "left")
      .filter(col("__alab").isNull || col("__nlab").isNull ||
              col("__alab") =!= col("__nlab"))
    val w = Window.partitionBy("anchor_id")
      .orderBy(col("cos").desc, col("neg_id").asc)
    filtered.withColumn("rank", row_number().over(w)).filter(col("rank") <= m)
      .select("anchor_id", "neg_id", "cos", "rank")
  }

  /** Fit the serve half of bitext mining: the target collection's
    * `BitextShard` (vectors + batch-identical backward-neighborhood
    * means) in the internal disjoint remap space. Batch-side; the
    * returned shard answers any (possibly streaming) src feed through
    * `bitextMineServe`. */
  def fitBitextServe(src: DataFrame, tgt: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): AnnServe.BitextShard = {
    require(k >= 1, s"k=$k")
    val srcShard = AnnServe.fitShard(remap(src, 0, idCol), idCol, vecCol)
    AnnServe.fitBitextShard(remap(tgt, 1, idCol), srcShard, k, idCol, vecCol)
  }

  /** `bitextMine` at SERVE tier — each src row's mined pair computed
    * by one row-local scan (`functions.BitextTopMargin`: forward
    * window, neighborhood means, ratio margin, argmax — the whole
    * batch algebra inside the scan, with the backward means fitted
    * into the shard). No join, no window, no state ⇒ append-mode
    * streaming-legal, and bit-identical to `bitextMine` row-for-row
    * (MiningSpec pins it; the streaming drain reuses the batch DuckDB
    * oracle verbatim). Output: (src_id, tgt_id, cos, margin) in the
    * callers' original id spaces. */
  def bitextMineServe(src: DataFrame, shard: AnnServe.BitextShard, k: Int,
                      idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    AnnServe.bitextTopRows(remap(src, 0, idCol), shard, k, idCol, vecCol)
      // both operands even ⇒ the arithmetic shift un-map is exact
      .select(shiftright(col("src_id"), 1).as("src_id"),
              shiftright(col("tgt_id") - 1, 1).as("tgt_id"),
              col("cos"), col("margin"))
}
