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

  /** Parse one JSONL line per row against `JsonlSchema`: typed field
    * extraction plus the `valid` verdict (`from_json` yields a null
    * id for any malformed line — truncated, mis-typed, empty). */
  def parseJsonl(lines: DataFrame, idCol: String = "doc_id",
                 lineCol: String = "line"): DataFrame = {
    val j = from_json(col(lineCol), JsonlSchema, Map.empty[String, String])
    lines.select(col(idCol).as("doc_id"), j.as("__j"))
      .select(col("doc_id"),
        col("__j").getField("id").isNotNull.cast("int").as("valid"),
        col("__j").getField("meta").getField("source").as("source"),
        col("__j").getField("meta").getField("lang").as("lang"),
        when(col("__j").getField("id").isNotNull,
          length(col("__j").getField("text"))).cast("int").as("n_text_chars"),
        col("__j").getField("score").as("score"),
        element_at(col("__j").getField("tags"), 2).as("tag2"))
  }
}
