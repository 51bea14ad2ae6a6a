package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level (paragraph-level) deduplication — the CCNet recipe:
  * a line whose exact content appears in at least `minDocs` DISTINCT
  * documents is boilerplate (headers, nav text, legal footers) and is
  * removed from EVERY document; lines repeated only WITHIN one
  * document survive (repetition inside a doc is the repetition
  * filter's concern, not cross-doc boilerplate). Runs after markup
  * extraction, before quality gating, in the standard pipeline order.
  * Reference scope anchor: north-star LLM-pipeline surface (the
  * reference has no text stage).
  */
object Lines {

  /** Remove cross-document duplicate lines. Output per doc:
    * `n_lines` (before), `n_removed`, `content` (kept lines joined
    * by \n, original order preserved).
    *
    * Scale shape: one posexplode over lines; the duplicate set is a
    * partial+final agg keyed on the 16-byte line digest (count
    * DISTINCT docs, so a doc-internal repeat cannot fake
    * boilerplate); membership is a digest-keyed JOIN — deliberately
    * not a broadcast, the boilerplate set at 100 TB is itself large —
    * and reassembly is one agg per doc whose order is pinned by
    * `sort_array` over (pos, ...) structs, never by collect order. */
  def lineDedup(docs: DataFrame, idCol: String, contentCol: String,
                minDocs: Int = 2): DataFrame = {
    val ex = docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(contentCol), "\n")).as(Seq("pos", "line")))
    val dup = ex
      .groupBy(md5(col("line").cast("binary")).as("__d"))
      .agg(countDistinct(col("doc_id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select("__d")
    val marked = ex
      .join(dup, md5(col("line").cast("binary")) === col("__d"), "left")
      .select(col("doc_id"), col("pos"), col("line"),
        col("__d").isNotNull.cast("int").as("__dup"))
    marked.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_lines"),
      sum(col("__dup")).cast("int").as("n_removed"),
      array_join(transform(
        filter(sort_array(collect_list(struct(col("pos"), col("__dup").as("d"),
          col("line").as("l")))), s => s.getField("d") === 0),
        s => s.getField("l")), "\n").as("content"))
  }

  /** Deterministic multi-line plant for the declared query (the
    * synthetic corpus has no newlines): each doc becomes
    *   1. `subscribe to the {source} newsletter`  — shared by every
    *      doc of the source → cross-doc dup, removed;
    *   2. the doc text — unique per doc (unless the corpus itself
    *      repeats a text, in which case removal is CORRECT);
    *   3. `tag {id % 4}` — shared across the corpus → removed;
    *   4. `closing note {id}` — unique, kept;
    *   5. on `id % 9 == 0`, line 4 REPEATED — a within-doc dup that
    *      must survive (distinct-doc count stays 1), exercising the
    *      distinct-docs clause both ways. */
  def linesWrapped(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, carry: Seq[String] = Nil): DataFrame = {
    val id = col(idCol)
    docs.select(id.as(idCol) +: carry.map(col) :+
      concat(
        lit("subscribe to the "), col(sourceCol), lit(" newsletter\n"),
        coalesce(col(textCol), lit("")), lit("\n"),
        lit("tag "), (id % 4).cast("string"), lit("\n"),
        lit("closing note "), id.cast("string"),
        when(id % 9 === 0,
          concat(lit("\nclosing note "), id.cast("string")))
          .otherwise(lit(""))).as("content"): _*)
  }
}
