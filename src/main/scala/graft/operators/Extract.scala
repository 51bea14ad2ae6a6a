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
    /** Comments and CDATA sections vanish with their CONTENT — a
      * comment may contain markup (`<!-- <p>..</p> -->`) that must
      * never reach the block splitter or leak into visible text on
      * organic pages. Stripped AFTER script/style: per the HTML
      * parsing rules script content is raw text, so a `<!--` inside a
      * script body is code, not a comment opener — comment-first would
      * let it swallow real content up to the next `-->` (a comment
      * containing a whole `<script>..</script>` pair still strips
      * correctly either way, and one containing a lone `<script>`
      * cannot match ScriptStyle, which requires the closer).
      * Non-greedy, backreference-free. */
    val CommentCdata: String =
      "(?s)(?:<!--.*?-->|<!\\[CDATA\\[.*?\\]\\]>)"

    /** Script/style elements vanish with their CONTENT (visible-text
      * extraction must never leak code). Non-greedy body, closing tag
      * matched literally per element kind — backreference-free. */
    val ScriptStyle: String =
      "(?is)(?:<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>)"

    // Numeric character references (decimal &#NNN; / hex &#xNN;) are
    // decoded by `functions.EntityDecode` for codepoints 1..255 — the
    // Latin-1 range, where every engine's chr agrees (Spark's char is
    // mod-256 above it); out-of-range references pass through verbatim.

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

  /** Full entity decode — named (`&lt; &gt; &quot; &nbsp; &amp;`,
    * plus `&#39;` through the numeric path) and numeric references
    * (decimal + hex, case-insensitive) in the Latin-1 range 1..255
    * where every engine's `chr` agrees; out-of-range references pass
    * through verbatim and each `&` is consumed at most once (true
    * single-decode: `&amp;#77;` → the literal `&#77;`). ONE native
    * codegen scan per evaluation (`functions.EntityDecode`) — the
    * layered `replace`/HOF-fold spelling measured 3× slower on
    * `q_web_pipeline` because interpreted lambdas re-run per output
    * column. Applied AFTER tag stripping, so decoded angle brackets
    * can never resurrect a tag. */
  def entityDecoded(c: Column): Column =
    graft.functions.ExtractOps.entityDecode(c)

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
                  maxLinkDen: Int = 3, carry: Seq[String] = Nil): DataFrame = {
    val blocks = split(
      regexp_replace(regexp_replace(col(htmlCol),
        Html.ScriptStyle, " "), Html.CommentCdata, " "), Html.BlockSplit)
    val raw = transform(blocks, b =>
      struct(blockText(b).as("t"), anchorWordCount(b).as("lw")))
    val feats = transform(raw, s => struct(
      s.getField("t").as("t"),
      regexp_count(s.getField("t"), lit(Html.Word)).cast("int").as("w"),
      s.getField("lw").as("lw")))
    // Materialize the block-features array ONCE per row behind a
    // single-element explode: the four output columns each reference
    // the array, and Spark re-evaluates interpreted HOF expressions
    // per referencing column (CollapseProject inlines through plain
    // projections) — a Generate node is a materialization barrier, so
    // the regex-heavy split/blockText/anchor work runs once and the
    // outputs fold over precomputed (t, w, lw) structs. Measured on
    // q_web_pipeline at sf0.1: 13.7 → 7.1 s from the native entity
    // decode, further reduced by this barrier.
    val exploded = docs.select(col(idCol).as("doc_id") +: carry.map(col) :+
      explode(array(feats)).as("__bs"): _*)
    val bs = col("__bs")
    val kept = filter(bs, s =>
      s.getField("w") >= minWords &&
        s.getField("lw") * maxLinkDen <= s.getField("w") * maxLinkNum)
    exploded.select(col("doc_id") +: carry.map(col) :+
      size(filter(bs, s => s.getField("w") >= 1)).cast("int").as("n_blocks") :+
      size(kept).cast("int").as("n_kept") :+
      aggregate(kept, lit(0), (a, s) => a + s.getField("w"))
        .cast("int").as("n_words") :+
      array_join(transform(kept, s => s.getField("t")), "\n").as("content"): _*)
  }

  /** Chrome-robust exact dedup keyed on the LEAD content block's
    * digest (the `q_web_pipeline` stage): identical article bodies
    * dedup even though per-page chrome (nav links, related-item
    * lists) differs by URL, which whole-page digests would miss.
    * Input is an `extractHtml` frame; output is the surviving
    * (doc_id, content) rows.
    *
    * Docs whose extraction kept ZERO blocks all carry `content = ""`
    * and would silently collapse into ONE digest group — they are
    * excluded from the keying and pass through unconditionally (a
    * later quality gate, not this dedup, decides their fate). Scale
    * shape: the only shuffle is on the 16-byte digest. */
  def leadBlockDedup(ex: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val out = "doc_id" +: "content" +: carry
    val keyed = ex.filter(col("n_kept") > 0).withColumn("__mk",
      md5(element_at(split(col("content"), "\n"), 1).cast("binary")))
    val keepers = keyed.groupBy("__mk").agg(min("doc_id").as("doc_id"))
    keyed.join(keepers, Seq("__mk", "doc_id"))
      .select(out.map(col): _*)
      .unionByName(
        ex.filter(col("n_kept") === 0).select(out.map(col): _*))
  }

  /** URL pattern set — crawl metadata is the other thing a web corpus
    * parses besides markup (domain quotas, canonicalization,
    * tracking-parameter hygiene). RE2-safe like `Html`. */
  object Url {
    val Scheme = "^([a-z][a-z0-9+.-]*)://"
    val Auth = "^[a-z][a-z0-9+.-]*://([^/?#]+)"
    val Path = "^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)"
    // Anchored through the authority and path so a '?' INSIDE the
    // fragment ("...#sec?x=1") is never misread as a query string.
    val Query = "^[a-z][a-z0-9+.-]*://[^?#]*\\?([^#]*)"
    val Ref = "[?&]ref=([^&#]*)"
    /** A percent-encoded octet. */
    val Pct = "%[0-9a-fA-F]{2}"
  }

  /** Registrable-ish domain of a URL/URI column: authority extract,
    * explicit port stripped, leading `www.` stripped — ONE spelling
    * shared by the WARC response chain, the robots gate prep and the
    * sitemap loc parse (urlParts derives the same pieces separately
    * because it also surfaces host and port). */
  def domainOf(u: Column): Column =
    regexp_replace(regexp_replace(regexp_extract(u, Url.Auth, 1),
      ":[0-9]+$", ""), "^www\\.", "")

  /** Host of a URL/URI column (authority minus explicit port, `www.`
    * KEPT — hosts are graph nodes; `domainOf` is the quota/rollup
    * key). ONE spelling shared by the link-graph extractor (src and
    * dst sides) and the fetch scheduler, mirrored verbatim by their
    * oracle fragments. */
  def hostOf(u: Column): Column =
    regexp_replace(regexp_extract(u, Url.Auth, 1), ":[0-9]+$", "")

  /** RFC 3986 §6.2.2 percent normalization: decode `%XX` when the
    * octet is UNRESERVED (ALPHA / DIGIT / `-` `.` `_` `~` — decoding
    * anything else, e.g. `%2F`, would change path semantics), and
    * uppercase the hex digits of every triplet left encoded. The
    * 2-digit code folds positionally via `instr` into the hex
    * alphabet — engine-portable, and decoded output is pure ASCII so
    * `char`/`chr` agree everywhere. Row-local, zero shuffle. */
  def pctNormalized(c: Column): Column =
    aggregate(
      array_distinct(regexp_extract_all(c, lit(Url.Pct), lit(0))),
      c,
      (acc, e) => {
        val code = ((instr(lit("0123456789abcdef"), substring(lower(e), 2, 1))
            - lit(1)) * 16 +
          (instr(lit("0123456789abcdef"), substring(lower(e), 3, 1)) - lit(1)))
          .cast("int")
        val unreserved = code.between(65, 90) || code.between(97, 122) ||
          code.between(48, 57) || code === 45 || code === 46 ||
          code === 95 || code === 126
        when(unreserved, replace(acc, e, call_function("char", code)))
          .otherwise(replace(acc, e, upper(e)))
      })

  /** Per-URL crawl metadata: scheme, host (authority minus port),
    * registrable-ish domain (leading `www.` stripped), explicit port
    * (null when absent), percent-normalized path, the `ref` query
    * parameter, the retained query parameters (tracking `utm_*` keys
    * dropped, the rest SORTED — order-insensitive equality), and the
    * canonical form: scheme preserved (http and https pages are
    * distinct resources), bare domain, default ports (http:80 /
    * https:443) stripped and explicit ones kept, empty path
    * normalized to `/`, sorted params appended, fragment dropped.
    * Pure scan-side regex/HOF expressions, zero shuffle. */
  def urlParts(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val u = col(urlCol)
    val scheme = regexp_extract(u, Url.Scheme, 1)
    val auth = regexp_extract(u, Url.Auth, 1)
    val host = regexp_replace(auth, ":[0-9]+$", "")
    val portStr = regexp_extract(auth, ":([0-9]+)$", 1)
    val domain = regexp_replace(host, "^www\\.", "")
    val path = pctNormalized(regexp_extract(u, Url.Path, 1))
    val query = regexp_extract(u, Url.Query, 1)
    val params = array_join(array_sort(filter(split(query, "&"),
      p => p =!= lit("") && !p.rlike("^utm_"))), "&")
    val defaultPort = (scheme === "http" && portStr === "80") ||
      (scheme === "https" && portStr === "443")
    val portPart = when(portStr === "" || defaultPort, lit(""))
      .otherwise(concat(lit(":"), portStr))
    df.select(col(idCol).as("doc_id"),
      scheme.as("scheme"), host.as("host"), domain.as("domain"),
      when(portStr === "", lit(null).cast("int"))
        .otherwise(portStr.cast("int")).as("port"),
      path.as("path"),
      regexp_extract(u, Url.Ref, 1).as("ref"),
      params.as("params"),
      concat(scheme, lit("://"), domain, portPart,
        when(path === "", lit("/")).otherwise(path),
        when(params === "", lit(""))
          .otherwise(concat(lit("?"), params))).as("canonical"))
  }

  /** Deterministic URL generator for the declared query (the plant
    * pattern): every canonicalization rule is exercised BOTH ways —
    * scheme http (id%5==0) vs https, `www.` on odd ids, explicit
    * DEFAULT port on id%4==0 (stripped) vs `:8080` on id%4==1 (kept)
    * vs none, empty path on id%6==0 (canonical `/`), percent plants
    * `%41` (unreserved → decoded `A`) and `%2f` (reserved → kept,
    * hex uppercased to `%2F`), out-of-order query params the sort
    * must fix, a `utm_source` key the hygiene rule drops, and
    * fragments on id%3==0. */
  def urlWrapped(docs: DataFrame, idCol: String, sourceCol: String,
                 langCol: String): DataFrame = {
    val id = col(idCol)
    val scheme = when(id % 5 === 0, lit("http")).otherwise(lit("https"))
    val defPort = when(id % 5 === 0, lit(":80")).otherwise(lit(":443"))
    val port = when(id % 4 === 0, defPort)
      .when(id % 4 === 1, lit(":8080"))
      .otherwise(lit(""))
    docs.select(id.as(idCol),
      concat(scheme, lit("://"),
        when(id % 2 === 1, lit("www.")).otherwise(lit("")),
        col(sourceCol), lit(".example.com"), port,
        when(id % 6 === 0, lit(""))
          .otherwise(concat(lit("/"), col(langCol), lit("/p%41ge%2f-"),
            id.cast("string"))),
        lit("?ref=r"), (id % 7).cast("string"), lit("&utm_source=feed&z=2&a=1"),
        when(id % 3 === 0, lit("#section-2")).otherwise(lit("")))
        .as("url"))
  }

  /** COARSE URL generator for `q_url_dedup`: page identity is
    * `id % 50`, so many raw URLs canonicalize to one key; within a
    * group the members differ ONLY by things canonicalization must
    * collapse — and each collapsing plant is keyed on a modulus that
    * VARIES inside an id%50 group (50 ≡ 1 mod 7, 2 mod 3, 2 mod 4),
    * so the collapse is genuinely exercised group-internally: `www.`
    * on id%7==0, explicit default port (id%4==0) vs no port,
    * fragments (id%3==0), and the percent SPELLING of the same path
    * (`/p%41ge%2f-` when id%3==1 vs the literal `/pAge%2F-`
    * otherwise — encoded and plain collapse to one form). Scheme
    * class (id%5, constant within a group since 50 ≡ 0 mod 5) and a
    * real `:8080` port (id%4==1) correctly SPLIT groups. */
  def urlWrappedCoarse(docs: DataFrame, idCol: String, sourceCol: String,
                       langCol: String): DataFrame = {
    val id = col(idCol)
    val scheme = when(id % 5 === 0, lit("http")).otherwise(lit("https"))
    val defPort = when(id % 5 === 0, lit(":80")).otherwise(lit(":443"))
    val port = when(id % 4 === 0, defPort)
      .when(id % 4 === 1, lit(":8080"))
      .otherwise(lit(""))
    docs.select(id.as(idCol),
      concat(scheme, lit("://"),
        when(id % 7 === 0, lit("www.")).otherwise(lit("")),
        col(sourceCol), lit(".example.com"), port,
        lit("/"), col(langCol),
        when(id % 3 === 1, lit("/p%41ge%2f-")).otherwise(lit("/pAge%2F-")),
        (id % 50).cast("string"),
        lit("?utm_source=feed&z=2&a=1"),
        when(id % 3 === 0, lit("#frag")).otherwise(lit("")))
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
    * boundary BOTH ways), and a two-word footer (dropped).
    *
    * Organic-HTML plants (r12): an HTML comment CONTAINING markup and
    * enough words to pass the keep gate if it leaked (it must vanish
    * whole), a CDATA section with raw angle brackets (same), numeric
    * character references both in-range (`&#65;` → A, `&#x42;` → B,
    * decoded) and out-of-range (`&#9731;`, left verbatim — the
    * documented Latin-1 decode bound exercised from BOTH sides), a
    * double-escaped reference (`&amp;#77;` must surface as the literal
    * text `&#77;`, single-decode order), and an unclosed `<b>` the tag
    * stripper must tolerate. */
  def htmlWrapped(docs: DataFrame, idCol: String, textCol: String,
                  carry: Seq[String] = Nil): DataFrame = {
    val id = col(idCol).cast("string")
    docs.select(col(idCol) +: carry.map(col) :+
      concat(
        lit("<html><head><title>doc "), id, lit("</title>"),
        lit("<style>body { color: #fff; }</style></head><body>"),
        lit("<!-- <p>hidden draft "), id,
        lit(" with eight leaked words never visible</p> -->"),
        lit("<![CDATA[<raw markup & six more hidden words>]]>"),
        lit("<nav><a href=\"/\">home</a> <a href=\"/about\">about site</a>" +
          " <a href=\"/c\">contact us</a></nav>"),
        lit("<script>var doc = "), id, lit("; track();</script>"),
        lit("<p>"), coalesce(col(textCol), lit("")),
        lit(" &amp; tail &lt;x&gt; &quot;quoted&quot; &#39;q&#39;&nbsp;end"),
        lit(" <b>num &#65;&#x42; far &#9731; esc &amp;#77; fin</p>"),
        lit("<li>see <a href=\"/d/"), id, lit("\">link "), id, lit("</a>"),
        expr(s"repeat(' w', CAST($idCol % 8 AS INT))"),
        lit(" mid tail</li>"),
        lit("<footer>copyright 2026</footer></body></html>")).as("html"): _*)
  }
}
