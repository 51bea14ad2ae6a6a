package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Extract

class ExtractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def extract(html: String) =
    Extract.extractHtml(Seq((1L, html)).toDF("doc_id", "html"),
      "doc_id", "html").head

  // ---- element stripping ----------------------------------------------

  test("script and style vanish WITH their content; code never leaks") {
    val r = extract(
      "<p>alpha beta gamma delta epsilon</p>" +
        "<script>var leak = 'should never appear anywhere';</script>" +
        "<style>p { margin: 0; } .leak { color: red }</style>" +
        "<p>one two three four five six</p>")
    assert(r.getAs[String]("content") ==
      "alpha beta gamma delta epsilon\none two three four five six")
    assert(r.getAs[Int]("n_kept") == 2)
  }

  test("inline tags do NOT split a block; block tags do") {
    // <b>/<span>/<a> stay inside one paragraph (their tags strip to
    // spaces); <p>/<div>/<br> open new blocks.
    val r = extract(
      "<p>one <b>two</b> three <span class=\"x\">four</span> five</p>" +
        "<div>six seven eight nine ten</div>")
    assert(r.getAs[Int]("n_blocks") == 2)
    assert(r.getAs[String]("content") ==
      "one two three four five\nsix seven eight nine ten")
  }

  // ---- entity decoding --------------------------------------------------

  test("entities decode after tag strip, &amp; last (double-escape stays)") {
    val r = extract(
      "<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d &amp;lt; e</p>")
    // &amp;lt; must decode to the LITERAL text "&lt;" (one level only)
    assert(r.getAs[String]("content") == "a <tag> \"q\" 's' b c & d &lt; e")
    // decoded '<tag>' is NOT re-stripped as markup (strip ran first)
    assert(r.getAs[String]("content").contains("<tag>"))
  }

  test("numeric references decode in the Latin-1 range, pass through above " +
       "it, and double-escapes stay single-decoded") {
    val r = extract(
      "<p>dec &#65; hex &#x42; mix &#X4a; nb&#160;sp accent &#233; far" +
        " &#9731; astral &#x1F600; esc &amp;#77; tail words</p>")
    // &#160; decodes to a literal NBSP (U+00A0), which the ASCII \s+
    // squeeze deliberately leaves in place
    assert(r.getAs[String]("content") ==
      "dec A hex B mix J nb sp accent é far" +
        " &#9731; astral &#x1F600; esc &#77; tail words")
  }

  test("comments vanish with their content, even when they contain markup " +
       "that would otherwise form keepable blocks") {
    val r = extract(
      "<p>alpha beta gamma delta epsilon</p>" +
        "<!-- <p>hidden six words that must never leak</p> -->" +
        "<![CDATA[<raw> markup & five hidden words]]>" +
        "<p>one two three four five</p>")
    assert(r.getAs[Int]("n_blocks") == 2)
    assert(r.getAs[String]("content") ==
      "alpha beta gamma delta epsilon\none two three four five")
  }

  test("a '<!--' INSIDE a script body is code, not a comment opener: " +
       "script strips first, real content after it survives") {
    val r = extract(
      "<script>if(x<!--y){track()}</script>" +
        "<p>eight real words of body text survive here</p>" +
        "<!-- a real comment -->")
    assert(r.getAs[String]("content") ==
      "eight real words of body text survive here")
    assert(!r.getAs[String]("content").contains("track"))
  }

  test("messy organic page: unclosed tags, a comment containing tags, and " +
       "attributes with angle-bracket-free junk still extract") {
    val r = extract(
      "<html><body><p>first block has five words <b>bold never closed" +
        "<!-- note: <div>this whole aside vanishes entirely</div> -->" +
        "<div class='x' data-k=\"v\">second block carries six more words" +
        "<p>third &amp; final block of words</body>")
    assert(r.getAs[Int]("n_kept") == 3)
    assert(r.getAs[String]("content") ==
      "first block has five words bold never closed\n" +
        "second block carries six more words\nthird & final block of words")
  }

  // ---- keep rules --------------------------------------------------------

  test("min-words gate drops short blocks; n_blocks still counts them") {
    val r = extract("<p>too short here</p><p>this block has five words</p>")
    assert(r.getAs[Int]("n_blocks") == 2)
    assert(r.getAs[Int]("n_kept") == 1)
    assert(r.getAs[String]("content") == "this block has five words")
  }

  test("link density boundary is integer-exact both ways (lw*3 <= w)") {
    // 2 anchor words of 6 total: 2*3 == 6 -> kept (boundary inclusive)
    val keep = extract(
      "<p>see <a href=\"/x\">link here</a> plus three words</p>")
    assert(keep.getAs[Int]("n_kept") == 1)
    // 2 anchor words of 5 total: 2*3 > 5 -> dropped
    val drop = extract(
      "<p>see <a href=\"/x\">link here</a> two words</p>")
    assert(drop.getAs[Int]("n_kept") == 0)
    assert(drop.getAs[Int]("n_blocks") == 1)
  }

  test("anchor words count words, not anchors; multi-anchor nav drops") {
    val r = extract(
      "<div><a href=\"/\">home</a> <a href=\"/a\">about the site</a>" +
        " <a href=\"/c\">contact</a></div>")
    // 5 visible words, all inside anchors: density 1 -> dropped
    assert(r.getAs[Int]("n_blocks") == 1)
    assert(r.getAs[Int]("n_kept") == 0)
  }

  // ---- degenerate inputs --------------------------------------------------

  test("tagless text is one block; empty html yields zero blocks") {
    val plain = extract("just five plain words here")
    assert(plain.getAs[Int]("n_blocks") == 1)
    assert(plain.getAs[Int]("n_kept") == 1)
    val empty = extract("")
    assert(empty.getAs[Int]("n_blocks") == 0)
    assert(empty.getAs[Int]("n_kept") == 0)
    assert(empty.getAs[String]("content") == "")
    assert(empty.getAs[Int]("n_words") == 0)
  }

  // ---- generator + batch/stream parity ------------------------------------

  test("htmlWrapped fixture: title/nav/footer drop, <p> keeps, <li> flips on doc_id%8") {
    val docs = Seq(
      (8L, "w1 w2 w3 w4 w5 w6"),   // 8 % 8 == 0 -> li dropped
      (9L, "w1 w2 w3 w4 w5 w6"))   // 9 % 8 == 1 -> li kept
      .toDF("doc_id", "text")
    val out = Extract.extractHtml(
        Extract.htmlWrapped(docs, "doc_id", "text"), "doc_id", "html")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_blocks") == 5) // title, nav, p, li, footer
    assert(out(0).getAs[Int]("n_kept") == 1)   // p only
    assert(out(1).getAs[Int]("n_kept") == 2)   // p + li
    // entity tail decodes inside the kept <p>: named + numeric dec/hex
    // in-range decode, &#9731; stays (out of Latin-1), &amp;#77;
    // single-decodes to the literal &#77;, the planted comment and
    // CDATA words never appear
    val c0 = out(0).getAs[String]("content")
    assert(c0.endsWith(
      "w6 & tail <x> \"quoted\" 'q' end num AB far &#9731; esc &#77; fin"))
    assert(!c0.contains("hidden") && !c0.contains("raw markup"))
  }

  test("leadBlockDedup: boilerplate-only pages (zero kept blocks) are NOT " +
       "collapsed into one digest group; each survives to the gate stage") {
    import org.apache.spark.sql.functions._
    val body = (1 to 40).map(i => s"word$i").mkString(" ")
    // docs 1,2 extract to zero kept blocks (pure link nav); 3,4 share a
    // body; 5 is unique
    val docs = Seq(
      (1L, "<div><a href=\"/\">one</a> <a href=\"/b\">two three</a></div>"),
      (2L, "<div><a href=\"/\">four</a> <a href=\"/b\">five six</a></div>"),
      (3L, s"<p>$body</p>"), (4L, s"<p>$body</p>"),
      (5L, s"<p>$body unique tail</p>")).toDF("doc_id", "html")
    val ex = Extract.extractHtml(docs, "doc_id", "html")
    val surv = Extract.leadBlockDedup(ex)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    // 1 and 2 BOTH pass through (previously they'd have collapsed into
    // one empty-content digest group); 4 dedups against 3
    assert(surv.toSeq == Seq(1L, 2L, 3L, 5L), s"survivors: ${surv.toSeq}")
  }

  test("web pipeline's chrome-robust dedup: identical article bodies " +
       "dedup across pages with different chrome (the driver corpus has " +
       "no exact dups, so the stage is pinned here)") {
    import org.apache.spark.sql.functions._
    // docs 3 and 5 share the body; their page chrome differs (the
    // skeleton stamps doc_id into nav/li) — a whole-page digest would
    // MISS this pair, the lead-block key must catch it
    val body = (1 to 40).map(i => s"word$i").mkString(" ")
    val docs = Seq((3L, body), (5L, body), (9L, body + " unique tail"))
      .toDF("doc_id", "text")
    val ex = Extract.extractHtml(
      Extract.htmlWrapped(docs, "doc_id", "text"), "doc_id", "html")
    val keyed = ex.withColumn("__mk",
      md5(element_at(split(col("content"), "\n"), 1).cast("binary")))
    // pages 3 and 5 share the lead-block digest despite different chrome
    assert(keyed.select("__mk").distinct().count() == 2)
    val surv = Extract.leadBlockDedup(ex)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(3L, 9L), s"keeper set: ${surv.toSeq}")
  }

  test("urlParts: www/port/percent/query/fragment canonicalization, each " +
       "rule both ways") {
    val urls = Seq(
      (1L, "https://www.site.example.com/en/page-1?ref=r3&utm_source=x#frag"),
      (2L, "http://bare.org/a/b?z=1&a=2"),
      (3L, "https://noquery.net/p"),
      (4L, "https://site.org:443/p%41th%2fx?b=1"),  // default port + pct
      (5L, "http://site.org:8080/y"),               // real port kept
      (6L, "http://site.org:80"),                   // default port + empty path
      (7L, "https://site.org/a%2Fb%7ec")            // %2F kept upper, %7e -> ~
    ).toDF("doc_id", "url")
    val out = Extract.urlParts(urls, "doc_id", "url").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("scheme") == "https")
    assert(out(1L).getAs[String]("domain") == "site.example.com")
    assert(out(1L).getAs[String]("path") == "/en/page-1")
    assert(out(1L).getAs[String]("ref") == "r3")
    assert(out(1L).getAs[String]("params") == "ref=r3") // utm_* dropped
    assert(out(1L).getAs[String]("canonical") ==
      "https://site.example.com/en/page-1?ref=r3")
    // scheme is PRESERVED (http pages are not https pages), params sorted
    assert(out(2L).getAs[String]("canonical") == "http://bare.org/a/b?a=2&z=1")
    assert(out(2L).getAs[String]("ref") == "")
    assert(out(3L).getAs[String]("canonical") == "https://noquery.net/p")
    assert(out(3L).isNullAt(out(3L).fieldIndex("port")))
    // default port stripped; %41 unreserved decodes, %2f uppercased
    assert(out(4L).getAs[Int]("port") == 443)
    assert(out(4L).getAs[String]("canonical") == "https://site.org/pAth%2Fx?b=1")
    assert(out(5L).getAs[String]("canonical") == "http://site.org:8080/y")
    assert(out(6L).getAs[String]("canonical") == "http://site.org/")
    assert(out(7L).getAs[String]("path") == "/a%2Fb~c")
    // a '?' INSIDE the fragment is NOT a query string
    val frag = Extract.urlParts(
      Seq((8L, "https://site.org/p#sec?y=1")).toDF("doc_id", "url"),
      "doc_id", "url").head
    assert(frag.getAs[String]("params") == "")
    assert(frag.getAs[String]("canonical") == "https://site.org/p")
  }

  test("streaming twin equals the batch transform on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val batch = Queries.all.find(_.name == "q_extract_html").get
      .run(spark, sf).collect()
    val streamed = streaming.CorpusStream.htmlExtractedOverFile(spark, sf)
      .orderBy("doc_id").collect()
    assert(batch.toSeq == streamed.toSeq)
  }
}
