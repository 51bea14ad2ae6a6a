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
    // entity tail decodes inside the kept <p>
    assert(out(0).getAs[String]("content")
      .endsWith("w6 & tail <x> \"quoted\" 'q' end"))
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
    val keepers = keyed.groupBy("__mk").agg(min("doc_id").as("doc_id"))
    val surv = keyed.join(keepers, Seq("__mk", "doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(surv.toSeq == Seq(3L, 9L), s"keeper set: ${surv.toSeq}")
  }

  test("urlParts: www stripping, fragment exclusion, ref extraction") {
    import org.apache.spark.sql.functions._
    val urls = Seq(
      (1L, "https://www.site.example.com/en/page-1?ref=r3&utm_source=x#frag"),
      (2L, "http://bare.org/a/b?x=1"),
      (3L, "https://noquery.net/p")).toDF("doc_id", "url")
    val out = Extract.urlParts(urls, "doc_id", "url").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("domain") == "site.example.com")
    assert(out(1L).getAs[String]("path") == "/en/page-1")
    assert(out(1L).getAs[String]("ref") == "r3")
    assert(out(1L).getAs[String]("canonical") ==
      "https://site.example.com/en/page-1")
    assert(out(2L).getAs[String]("host") == "bare.org")
    assert(out(2L).getAs[String]("domain") == "bare.org")
    assert(out(2L).getAs[String]("ref") == "")
    assert(out(3L).getAs[String]("path") == "/p")
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
