package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Markup boilerplate extraction — the step every web-scale training
  * corpus runs FIRST (before any dedup/quality gate in SURVEY's LLM
  * pipeline ordering): turn raw HTML into main-content text by
  * stripping script/style, segmenting on block-level tags, stripping
  * inline tags, decoding entities, and keeping only blocks that look
  * like prose (enough words, low link density) — the jusText /
  * trafilatura / CCNet-extraction recipe reduced to its deterministic,
  * engine-portable core.
  *
  * Every pattern below is in the RE2-compatible subset (no lookaround,
  * no backreferences) so the EXACT same strings run under Java regex
  * (Spark) and RE2 (DuckDB / production scanners) with identical
  * semantics — the `Corpus.Pii` precedent. The whole operator is pure
  * per-row scan-side expressions: zero shuffle, the same plan at any
  * scale, and the streaming twin is the batch transform verbatim
  * (stateless append mode).
  *
  * Link density uses INTEGER arithmetic (`lw * den <= w * num` instead
  * of `lw/w <= num/den`) so the keep decision never touches floating
  * point — bit-portable across engines by construction. */
object Extract {

  /** The shared pattern set. */
  object Html {
    /** Script/style elements vanish with their CONTENT (visible-text
      * extraction must never leak code). Non-greedy body, closing tag
      * matched literally per element kind — backreference-free. */
    val ScriptStyle: String =
      "(?is)(?:<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>)"

    /** Block-level boundary tags (open or close): each one starts a new
      * candidate text block. Inline tags (a, b, span, ...) deliberately
      * absent — they must NOT split a paragraph. */
    val BlockSplit: String =
      "(?i)(?:</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|" +
        "section|article|header|footer|nav)\\b[^>]*>|<br */?>)"

    /** Any remaining tag, stripped to a space inside a block. */
    val Tag: String = "<[^>]*>"

    /** Anchor elements with their inner text as group 1 — the link-
      * density numerator. */
    val Anchor: String = "(?is)<a\\b[^>]*>(.*?)</a>"

    /** A word, for density/min-length purposes: an alphanumeric run. */
    val Word: String = "[A-Za-z0-9]+"
  }

  /** The five named entities worth decoding without a full table
    * (covers the generator and the overwhelming share of real pages);
    * `&amp;` LAST so double-escaped text stays single-escaped — the
    * HTML-spec decode order. Applied AFTER tag stripping, so decoded
    * angle brackets can never resurrect a tag. */
  def entityDecoded(c: Column): Column =
    replace(replace(replace(replace(replace(replace(c,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))

  /** One block's visible text: strip tags, decode entities, squeeze
    * whitespace. */
  def blockText(b: Column): Column =
    trim(regexp_replace(entityDecoded(regexp_replace(b, Html.Tag, " ")),
      "\\s+", " "))

  /** Words inside this block's anchors — the link-density numerator.
    * `aggregate` over the group-1 extracts; empty array folds to 0. */
  def anchorWordCount(b: Column): Column =
    aggregate(regexp_extract_all(b, lit(Html.Anchor), lit(1)), lit(0),
      (acc, a) => acc + regexp_count(a, lit(Html.Word)).cast("int"))

  /** Main-content extraction over an HTML column. Output per doc:
    * `n_blocks` (blocks with any visible word), `n_kept`, `n_words`
    * (words across kept blocks), `content` (kept blocks joined by \n).
    *
    * A block is kept iff it has at least `minWords` visible words AND
    * its link density is at most `maxLinkNum/maxLinkDen` (checked as
    * `lw * maxLinkDen <= w * maxLinkNum` — integer-exact).
    *
    * Shape: one `split` + three higher-order passes per ROW — no
    * explode, no shuffle, no UDF; a 100 TB crawl extracts at scan
    * speed and partitions trivially. (The HOF lambdas are interpreted
    * rather than codegen'd, but they are row-local string work — the
    * shuffle-free shape dominates at scale, and the regex engines are
    * the cost either way.) */
  def extractHtml(docs: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5, maxLinkNum: Int = 1,
                  maxLinkDen: Int = 3): DataFrame = {
    val blocks = split(
      regexp_replace(col(htmlCol), Html.ScriptStyle, " "), Html.BlockSplit)
    val raw = transform(blocks, b =>
      struct(blockText(b).as("t"), anchorWordCount(b).as("lw")))
    val feats = transform(raw, s => struct(
      s.getField("t").as("t"),
      regexp_count(s.getField("t"), lit(Html.Word)).cast("int").as("w"),
      s.getField("lw").as("lw")))
    val kept = filter(feats, s =>
      s.getField("w") >= minWords &&
        s.getField("lw") * maxLinkDen <= s.getField("w") * maxLinkNum)
    docs.select(col(idCol).as("doc_id"),
      size(filter(feats, s => s.getField("w") >= 1)).cast("int").as("n_blocks"),
      size(kept).cast("int").as("n_kept"),
      aggregate(kept, lit(0), (a, s) => a + s.getField("w"))
        .cast("int").as("n_words"),
      array_join(transform(kept, s => s.getField("t")), "\n").as("content"))
  }

  /** URL pattern set — crawl metadata is the other thing a web corpus
    * parses besides markup (domain quotas, canonicalization,
    * tracking-parameter hygiene). RE2-safe like `Html`. */
  object Url {
    val Host = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
    val Path = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
    val Ref = "[?&]ref=([^&#]*)"
  }

  /** Per-URL crawl metadata: host, registrable-ish domain (leading
    * `www.` stripped), path, the `ref` query parameter, and the
    * canonical form (scheme + bare domain + path — query and fragment
    * dropped, the tracking-hygiene rule). Pure scan-side regexes. */
  def urlParts(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val host = regexp_extract(u, Url.Host, 1)
    val domain = regexp_replace(host, "^www\\.", "")
    val path = regexp_extract(u, Url.Path, 1)
    df.select(col(idCol).as("doc_id"),
      host.as("host"), domain.as("domain"), path.as("path"),
      regexp_extract(u, Url.Ref, 1).as("ref"),
      concat(lit("https://"), domain, path).as("canonical"))
  }

  /** Deterministic URL generator for the declared query (the plant
    * pattern): scheme/host/path/query all vary with the document's
    * own columns so parsing has real variation — odd ids get a `www.`
    * prefix the canonicalizer must strip, every third id carries a
    * fragment the path/query extraction must ignore. */
  def urlWrapped(docs: DataFrame, idCol: String, sourceCol: String,
                 langCol: String): DataFrame = {
    val id = col(idCol)
    docs.select(id.as(idCol),
      concat(lit("https://"),
        when(id % 2 === 1, lit("www.")).otherwise(lit("")),
        col(sourceCol), lit(".example.com/"), col(langCol),
        lit("/page-"), id.cast("string"),
        lit("?ref=r"), (id % 7).cast("string"), lit("&utm_source=feed"),
        when(id % 3 === 0, lit("#section-2")).otherwise(lit("")))
        .as("url"))
  }

  /** Deterministic page generator for the declared query (the
    * `q_pii_redact` plant pattern: the synthetic corpus has no organic
    * HTML, so both engines wrap each document in the SAME page
    * skeleton via identical concat algebra, and the oracle re-derives
    * generation AND extraction end to end). The skeleton exercises
    * every extraction rule: a title fragment (dropped: too few words),
    * a nav of pure links (dropped: link density 1), a style and a
    * script element (stripped with their content), the document text
    * as a <p> with all six entities appended (kept; decode is
    * hash-checked through `content`), a <li> mixing one link with
    * `doc_id % 8` filler words (kept iff doc_id % 8 >= 1 — the density
    * boundary BOTH ways), and a two-word footer (dropped). */
  def htmlWrapped(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val id = col(idCol).cast("string")
    docs.select(col(idCol),
      concat(
        lit("<html><head><title>doc "), id, lit("</title>"),
        lit("<style>body { color: #fff; }</style></head><body>"),
        lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about site</a>" +
          " <a href=\"/c\">contact us</a></nav>"),
        lit("<script>var doc = "), id, lit("; track();</script>"),
        lit("<p>"), coalesce(col(textCol), lit("")),
        lit(" &amp; tail &lt;x&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end</p>"),
        lit("<li>see <a href=\"/d/"), id, lit("\">link "), id, lit("</a>"),
        expr(s"repeat(' w', CAST($idCol % 8 AS INT))"),
        lit(" mid tail</li>"),
        lit("<footer>copyright 2026</footer></body></html>")).as("html"))
  }
}
