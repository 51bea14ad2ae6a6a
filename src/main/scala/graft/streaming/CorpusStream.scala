package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus ingestion for the LLM-data-pipeline family: dedup
  * an unbounded document stream with watermark-bounded state — the
  * streaming counterparts of `q_dedup_exact` / `dedup_simhash`.
  * State holds only digests/signatures (never document bodies), and
  * Spark evicts entries older than the watermark, so state size is
  * bounded by the horizon's unique-content count at any corpus rate.
  */
object CorpusStream {

  /** Keep the FIRST occurrence of each exact content fingerprint
    * within the watermark horizon. The dedup shuffle carries the
    * 128-bit digest, not the text. */
  def dedupExact(docs: DataFrame, tsCol: String = "ts",
                 textCol: String = "text",
                 watermark: String = "1 day"): DataFrame =
    docs.withColumn("__fp", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** The full streaming curation pass: the SAME row-local language +
    * quality gates as the batch `q_corpus_clean` plan
    * (`Corpus.langQualityGate` — scan-side, zero state), then
    * first-occurrence exact dedup within the watermark horizon. A
    * streaming corpus lands curated exactly as the batch pipeline
    * would curate it, with state bounded by the horizon's unique
    * digests. */
  def cleaned(docs: DataFrame, tsCol: String = "ts",
              textCol: String = "text",
              watermark: String = "1 day"): DataFrame =
    dedupExact(
      docs.filter(graft.operators.Corpus.langQualityGate(col(textCol))),
      tsCol, textCol, watermark)

  /** Near-dup streaming heuristic: drop documents whose 64-bit SimHash
    * signature (native codegen expression) collides with an earlier
    * doc in the horizon. Hamming-0 collision ⇒ near-identical token
    * frequency profiles; for banded hamming-k matching, run the batch
    * `Dedup.simhashPairs` over the deduped sink instead (pairwise
    * banding needs a self-join, which streaming state can't express
    * one-pass). */
  def dedupBySimhash(docs: DataFrame, tsCol: String = "ts",
                     textCol: String = "text",
                     watermark: String = "1 day"): DataFrame =
    docs.withColumn("__sig",
        graft.functions.TextHash.simhash64(split(trim(col(textCol)), "\\s+")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__sig")
      .drop("__sig")
}
