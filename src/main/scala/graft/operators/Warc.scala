package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WARC ingestion — the real front door of a web corpus: crawls ship
  * as WARC files (ISO 28500), a sequence of records each framed as a
  * version line (`WARC/1.0`), a CRLF-terminated header block, and a
  * payload delimited by the header's `Content-Length` — NOT by any
  * separator scan: response payloads routinely contain the `CRLFCRLF`
  * header/payload boundary themselves (every HTTP response body does),
  * so a split-based reader is wrong by construction and the parser
  * here walks offsets.
  *
  * The parse is a per-FILE fold (`aggregate` over a bounded step
  * sequence): each step validates the magic, locates the header end,
  * extracts `WARC-Type`/`WARC-Target-URI`/`WARC-Date`/`Content-Length`,
  * checks that the stated payload and its trailing `CRLFCRLF` fit
  * inside the file, and advances the offset past the record. ANY
  * framing violation — bad magic, non-numeric length, payload past
  * EOF, missing trailer (which is how an over-stated length surfaces
  * mid-file: the offset lands in the next record's header) — marks
  * the file malformed and STOPS: records before the corruption are
  * kept, the tail is skipped, nothing throws. Count-don't-crash, the
  * ingestion rule.
  *
  * Scale shape: the fold is row-local per file — a 1000-executor read
  * parses files embarrassingly parallel with zero shuffle; the only
  * shuffle in the whole declared query is the generator's group-by
  * (real ingestion reads files, it does not build them). The fold
  * runs as an interpreted higher-order function, fine for the
  * correctness surface; a production reader at 100 TB would lower
  * exactly this state machine into a native `Expression`/`FileFormat`
  * over byte buffers (the repo's FuzzyMatch precedent) — the
  * semantics proven here are the spec for it. */
object Warc {

  val Crlf = "\r\n"
  val Sep = "\r\n\r\n"

  // ---- generation (the plant pattern) -----------------------------------

  /** One WARC record per document, every framing rule planted BOTH
    * ways: `request` records on id%11==7 (the response filter must
    * skip but still frame past them), a non-numeric `Content-Length`
    * on id%23==11 and an over-stated one (+50) on id%23==17 (each
    * poisons its FILE from that record on), and every response
    * payload is a genuine HTTP message (status line + headers +
    * CRLFCRLF + the skeleton page from `Extract.htmlWrapped`), so the
    * record-framing separator occurs INSIDE every payload and only a
    * length-delimited parse survives. Text is pre-stripped to ASCII
    * so character counts equal byte counts — the in-repo plant's
    * simplification; a production reader counts bytes over binary. */
  def warcRecords(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, langCol: String = "lang"): DataFrame = {
    val id = col(idCol)
    val base = docs.withColumn(textCol,
      regexp_replace(coalesce(col(textCol), lit("")), "[^ -~]", ""))
    val page = Extract.htmlWrapped(base, idCol, textCol,
      carry = Seq(sourceCol, langCol))
    val uri = concat(lit("https://"),
      when(id % 2 === 1, lit("www.")).otherwise(lit("")),
      col(sourceCol), lit(".example.com/"), col(langCol),
      lit("/crawl-"), id.cast("string"))
    val typ = when(id % 11 === 7, lit("request")).otherwise(lit("response"))
    val payload = when(id % 11 === 7, lit("GET / HTTP/1.1"))
      .otherwise(concat(
        lit("HTTP/1.1 200 OK" + Crlf + "Content-Type: text/html" + Sep),
        col("html")))
    val wdate = concat(lit("2026-08-"),
      lpad(((id % 28) + 1).cast("string"), 2, "0"), lit("T12:00:00Z"))
    val lenField = when(id % 23 === 11, lit("XX"))
      .when(id % 23 === 17, (length(payload) + 50).cast("string"))
      .otherwise(length(payload).cast("string"))
    page.select(id,
      concat(lit("WARC/1.0" + Crlf),
        lit("WARC-Type: "), typ, lit(Crlf),
        lit("WARC-Target-URI: "), uri, lit(Crlf),
        lit("WARC-Date: "), wdate, lit(Crlf),
        lit("Content-Length: "), lenField, lit(Sep),
        payload, lit(Sep)).as("rec"))
  }

  /** Concatenate records into FILES, in doc_id order (`array_sort`
    * on (doc_id, rec) structs — deterministic on every engine). When
    * `nFiles` is None (the declared chains) files are CONSECUTIVE
    * id blocks — `gid = doc_id div 32` — so every file holds at most
    * 32 records at ANY scale factor, always under `parseWarc`'s
    * 64-record walk bound, with zero look-at-the-corpus work: no
    * count, no scalar join, the file key is a per-row expression and
    * the grouping is ONE hash agg (the r12 derived-count spelling
    * paid a 1-row broadcast nested-loop join for the same guarantee
    * and broke the crawl flagship's no-BNLJ plan gate). Growing the
    * corpus grows the FILE count, never the records-per-file, and
    * the DuckDB `files` CTE mirrors the same `doc_id // 32` key.
    * Sparse id sets make smaller files — never bigger ones — so the
    * bound cannot be violated by id distribution. Explicit `nFiles`
    * (round-robin `id % n`) remains for fixtures and the soak
    * probe. */
  def warcFiles(records: DataFrame, idCol: String = "doc_id",
                recCol: String = "rec", nFiles: Option[Int] = None): DataFrame = {
    val gid = nFiles match {
      case Some(n) => (col(idCol) % lit(n.toLong)).cast("int")
      case None => expr(s"$idCol div 32L").cast("int")
    }
    records
      .groupBy(gid.as("gid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(idCol), col(recCol).as("rec")))),
        s => s.getField("rec")), "").as("wf"))
  }

  // ---- the parser ---------------------------------------------------------

  /** Parse one WARC file per row into its records + file verdict:
    * `recs` (every well-framed record, in order), `n_recs`, and
    * `n_bad` — the COUNT of framing violations (0 = clean file). A
    * violation no longer costs the rest of the file: the walk
    * resyncs to the next `WARC/1.0\r\n` magic past the violation
    * (the production warcio recovery rule — without it, one corrupt
    * record per consecutive-id file truncated ~4/5 of the planted
    * corpus out of the crawl chain). One native offset-walking scan
    * per file (`functions.WarcParse` — each byte touched once,
    * inside the enclosing codegen span; the earlier `aggregate`-HOF
    * fold re-ran O(file) interpreted substring work per step),
    * materialized once behind a single-element explode so the three
    * consumers read a bound attribute. `maxRecords` bounds the walk;
    * size files so they stay under it (the declared chains key files
    * by `doc_id div 32`). */
  def parseWarc(files: DataFrame, warcCol: String = "wf",
                maxRecords: Int = 64): DataFrame = {
    val others = files.columns.filterNot(_ == warcCol).toSeq
    files.select(others.map(col) :+
        explode(array(graft.functions.WarcOps.warcParse(col(warcCol),
          maxRecords))).as("__st"): _*)
      .withColumn("n_recs", size(col("__st.recs")).cast("int"))
      .withColumn("n_bad", col("__st.bad").cast("int"))
      .withColumn("recs", col("__st.recs"))
      .drop("__st")
  }

  /** Response records exploded with the crawl-metadata chain: doc_id
    * recovered from the target URI, domain via the shared
    * `Extract.Url` parse (www stripped), the HTTP body split off the
    * payload at the first CRLFCRLF, and its md5. Row-local after the
    * explode — zero shuffle. */
  def responses(parsed: DataFrame): DataFrame = {
    val r = col("r")
    parsed.select(col("gid"), col("n_recs"), col("n_bad"),
        explode(col("recs")).as("r"))
      .filter(r.getField("typ") === "response")
      .select(
        regexp_extract(r.getField("uri"), "/crawl-([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        col("gid"), r.getField("ridx").as("ridx"),
        r.getField("uri").as("uri"),
        Extract.domainOf(r.getField("uri")).as("domain"),
        r.getField("wdate").as("wdate"),
        r.getField("clen").as("clen"),
        regexp_replace(r.getField("payload"), "(?s)^.*?\r\n\r\n", "")
          .as("body"),
        col("n_recs"), col("n_bad"))
  }

  /** The full declared chain: generate → group into files → parse →
    * filter responses → extract the HTML body (`Extract.extractHtml`,
    * the markup operator verbatim). One query from crawl bytes to
    * per-page content stats. */
  def parseWarcChain(docs: DataFrame, nFiles: Option[Int] = None): DataFrame = {
    val parsed = parseWarc(warcFiles(warcRecords(
      docs, "doc_id", "text", "source"), nFiles = nFiles))
    val resp = responses(parsed)
      .withColumn("body_md5", md5(col("body").cast("binary")))
    Extract.extractHtml(resp, "doc_id", "body",
        carry = Seq("gid", "ridx", "uri", "domain", "wdate", "clen",
          "body_md5", "n_recs", "n_bad"))
      .drop("content")
  }
}
