package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sitemap ingestion — the other half of crawl discovery next to
  * `Robots`: sites publish sitemap XML (sitemaps.org protocol) listing
  * canonical page URLs with optional change metadata, and a crawler
  * seeds its frontier from them. The parser extracts `<url>` entries,
  * reads `<loc>` (mandatory — entries without one are COUNTED and
  * dropped, never thrown on), `<lastmod>` (optional → null) and
  * `<priority>` (optional → null), and chains the locs into the
  * shared `Extract.Url` metadata parse.
  *
  * Shape: pure per-row regex extraction + one explode — sitemaps
  * parse at scan speed with zero shuffle at any corpus size; the
  * per-sitemap entry/skip counts ride the pre-explode row (the
  * WARC-chain carry pattern). */
object Sitemap {

  /** One `<url>` entry body per match. */
  val Entry: String = "(?s)<url>(.*?)</url>"
  val Loc: String = "<loc>([^<]*)</loc>"
  val Lastmod: String = "<lastmod>([^<]*)</lastmod>"
  val Priority: String = "<priority>([^<]*)</priority>"

  /** Parse one sitemap XML per row into its url entries: `doc_id`
    * (recovered from the loc's page id), `host`, `loc`, `lastmod`
    * (null when absent), `priority` (null when absent), plus the
    * per-sitemap `n_entries` (well-formed) and `n_skipped` (entries
    * missing a loc). */
  def parseSitemap(sitemaps: DataFrame, xmlCol: String = "xml"): DataFrame = {
    val locOf = (e: org.apache.spark.sql.Column) => regexp_extract(e, Loc, 1)
    val others = sitemaps.columns.filterNot(_ == xmlCol).toSeq
    // Materialize the O(file) entry extraction ONCE behind a
    // single-element explode (the extractHtml/parseWarc barrier
    // pattern) — the count columns and the row explode then read a
    // bound attribute instead of re-scanning the XML per reference.
    val staged = sitemaps.select(others.map(col) :+
      explode(array(regexp_extract_all(col(xmlCol), lit(Entry), lit(1))))
        .as("__es"): _*)
    staged.select(others.map(col) :+ col("__es") :+
        size(filter(col("__es"), e => locOf(e) =!= ""))
          .cast("int").as("n_entries"): _*)
      .withColumn("n_skipped",
        (size(col("__es")) - col("n_entries")).cast("int"))
      .select(others.map(col) :+ col("n_entries") :+ col("n_skipped") :+
        explode(col("__es")).as("__e"): _*)
      .filter(locOf(col("__e")) =!= "")
      .select(others.map(col) ++ Seq(
        regexp_extract(locOf(col("__e")), "page-([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        Extract.domainOf(locOf(col("__e"))).as("host"),
        locOf(col("__e")).as("loc"),
        nullif(regexp_extract(col("__e"), Lastmod, 1), lit("")).as("lastmod"),
        nullif(regexp_extract(col("__e"), Priority, 1), lit(""))
          .cast("double").as("priority"),
        col("n_entries"), col("n_skipped")): _*)
  }

  /** Deterministic sitemap generator (the plant pattern): one sitemap
    * per source host, entries in doc_id order; every third doc omits
    * `<lastmod>` (optional-field handling both ways), priority cycles
    * doc_id%10, and each sitemap carries one loc-less draft entry the
    * parser must count and skip. */
  def sitemapWrapped(docs: DataFrame, idCol: String, sourceCol: String,
                     langCol: String): DataFrame = {
    val id = col(idCol)
    val entry = concat(
      lit("<url><loc>https://"), col(sourceCol), lit(".example.com/"),
      col(langCol), lit("/page-"), id.cast("string"), lit("</loc>"),
      when(id % 3 === 0, lit(""))
        .otherwise(concat(lit("<lastmod>2026-08-"),
          lpad(((id % 28) + 1).cast("string"), 2, "0"), lit("</lastmod>"))),
      lit("<priority>0."), (id % 10).cast("string"), lit("</priority>"),
      lit("</url>"))
    docs.select(col(sourceCol).as("src"), id.as(idCol), entry.as("e"))
      .groupBy("src")
      .agg(concat(
        lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
          "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col("e")))),
          s => s.getField("e")), ""),
        lit("<url><!-- draft, loc pending --></url></urlset>")).as("xml"))
  }
}
