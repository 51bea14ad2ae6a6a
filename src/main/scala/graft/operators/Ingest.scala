package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured-record ingestion — the OTHER front door of a training
  * pipeline next to `Extract`'s markup path: corpora ship as JSONL
  * (one JSON object per line), and the first stage parses each line
  * against an expected schema, extracts the typed fields, and DROPS
  * (but counts) malformed lines instead of aborting a 100 TB read.
  *
  * The declared query's contract is a per-engine JSON ROUND TRIP:
  * each engine serializes the same record through its OWN codec
  * (`to_json` here, `to_json` over a struct literal in DuckDB) and
  * parses it back — the serializations differ textually (key spacing,
  * float formatting) but parse∘build is the identity on both, so the
  * extracted VALUES must match field for field. Corrupt lines are
  * planted by truncation (always-invalid by construction) and must
  * surface as `valid = 0` rows with null fields — the
  * count-don't-crash ingestion rule.
  *
  * Shape: `to_json`/`from_json` are codegen'd per-row expressions —
  * scan-parallel, zero shuffle, stateless in streaming append mode. */
object Ingest {

  /** The expected record schema (DDL form for `from_json`). */
  val JsonlSchema: String =
    "id BIGINT, meta STRUCT<source: STRING, lang: STRING>, " +
      "text STRING, score DOUBLE, tags ARRAY<STRING>"

  /** Wrap each document as one JSONL line via the engine's own JSON
    * builder; every `doc_id % 17 == 0` line is truncated by three
    * characters (the tail is always `..."]}`-shaped, so truncation is
    * invalid JSON by construction — a deterministic corrupt-record
    * class). */
  def jsonlWrapped(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, langCol: String): DataFrame = {
    val id = col(idCol)
    val payload = to_json(struct(
      id.as("id"),
      struct(col(sourceCol).as("source"), col(langCol).as("lang")).as("meta"),
      coalesce(col(textCol), lit("")).as("text"),
      (id % 100 / 100.0).as("score"),
      array(lit("alpha"),
        concat(lit("b-"), (id % 5).cast("string"))).as("tags")))
    docs.select(id.as("doc_id"), payload.as("__line"))
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0,
          expr("substring(__line, 1, length(__line) - 3)"))
          .otherwise(col("__line")).as("line"))
  }

  /** Sharded JSONL EXPORT — the training-data handoff format: each
    * row serialized as one JSON object via the engine's codec, one
    * line per row, laid out as `shard=i/` directories keyed by
    * `doc_id % numShards`. Shard MEMBERSHIP is the modulo (not a
    * hash-partition accident) and lines within a shard are sorted,
    * so a re-export produces byte-identical shards — diff-based
    * delivery works. Returns the written line count. Scale shape:
    * one shuffle on the shard key, a within-partition sort, then
    * scan-speed text writes — no driver involvement. */
  def writeJsonl(docs: DataFrame, idCol: String, path: String,
                 numShards: Int = 4): Long = {
    val cols = docs.columns.filterNot(_ == idCol)
    val out = docs.select(
      (col(idCol) % numShards).cast("int").as("shard"),
      to_json(struct(col(idCol).as("id") +:
        cols.map(c => col(c).as(c)): _*)).as("value"))
    out.repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "value")
      .write.partitionBy("shard").mode("overwrite").text(path)
    out.count()
  }

  /** Read back a JSONL export written by `writeJsonl` (partition
    * discovery surfaces the shard directories; the JSON lines carry
    * the data). */
  def readJsonl(spark: org.apache.spark.sql.SparkSession, path: String,
                schemaDdl: String): DataFrame =
    spark.read.text(path)
      .select(from_json(col("value"), schemaDdl,
        Map.empty[String, String]).as("__j"))
      .select(col("__j.*"))

  /** Parse one JSONL line per row against `JsonlSchema`: typed field
    * extraction plus the `valid` verdict. Spark 4 parses with partial
    * results enabled (`spark.sql.json.enablePartialResults`), so a
    * corrupt line whose failure occurs AFTER some field parses can
    * surface a partially-null struct — keying validity on `id` alone
    * would call such a line valid. The verdict therefore requires
    * EVERY schema-mandatory field non-null (the generator always
    * populates all of them, so on well-formed lines this is identical
    * to the id check, while any partial parse is correctly rejected). */
  def parseJsonl(lines: DataFrame, idCol: String = "doc_id",
                 lineCol: String = "line"): DataFrame = {
    val j = from_json(col(lineCol), JsonlSchema, Map.empty[String, String])
    val ok = j.getField("id").isNotNull &&
      j.getField("meta").getField("source").isNotNull &&
      j.getField("meta").getField("lang").isNotNull &&
      j.getField("text").isNotNull &&
      j.getField("score").isNotNull &&
      j.getField("tags").isNotNull
    lines.select(col(idCol).as("doc_id"), j.as("__j"), ok.as("__ok"))
      .select(col("doc_id"),
        col("__ok").cast("int").as("valid"),
        when(col("__ok"),
          col("__j").getField("meta").getField("source")).as("source"),
        when(col("__ok"),
          col("__j").getField("meta").getField("lang")).as("lang"),
        when(col("__ok"),
          length(col("__j").getField("text"))).cast("int").as("n_text_chars"),
        when(col("__ok"), col("__j").getField("score")).as("score"),
        when(col("__ok"),
          element_at(col("__j").getField("tags"), 2)).as("tag2"))
  }
}
