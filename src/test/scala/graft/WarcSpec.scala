package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Warc

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rec(typ: String, uri: String, payload: String,
                  statedLen: Option[Any] = None): String =
    "WARC/1.0\r\n" +
      s"WARC-Type: $typ\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "WARC-Date: 2026-08-15T12:00:00Z\r\n" +
      s"Content-Length: ${statedLen.getOrElse(payload.length)}\r\n" +
      "\r\n" + payload + "\r\n\r\n"

  private def parse(wf: String) =
    Warc.parseWarc(Seq((1, wf)).toDF("gid", "wf")).head

  test("multi-record file parses in order; payloads containing the " +
       "CRLFCRLF separator do NOT break framing (length-delimited)") {
    val p1 = "HTTP/1.1 200 OK\r\nX: y\r\n\r\n<p>body one with words</p>"
    val p2 = "HTTP/1.1 200 OK\r\n\r\nWARC/1.0\r\n fake magic inside body"
    val r = parse(rec("response", "https://a.org/crawl-1", p1) +
      rec("response", "https://a.org/crawl-2", p2))
    assert(r.getAs[Int]("n_recs") == 2 && r.getAs[Int]("n_bad") == 0)
    val recs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("recs"))
    assert(recs.map(_.getAs[String]("payload")) == Seq(p1, p2))
    assert(recs.map(_.getAs[Int]("ridx")) == Seq(1, 2))
  }

  test("non-numeric Content-Length counts a violation and the walk " +
       "RESYNCS — records behind the corrupt one still parse") {
    val good = rec("response", "https://a.org/crawl-1", "payload words here")
    val bad = rec("response", "https://a.org/crawl-2", "x", Some("XX"))
    val after = rec("response", "https://a.org/crawl-3", "reached via resync")
    val r = parse(good + bad + after)
    assert(r.getAs[Int]("n_recs") == 2 && r.getAs[Int]("n_bad") == 1)
    val recs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("recs"))
    assert(recs.map(_.getAs[String]("uri")) ==
      Seq("https://a.org/crawl-1", "https://a.org/crawl-3"))
    assert(recs.map(_.getAs[Int]("ridx")) == Seq(1, 2))
  }

  test("over-stated Content-Length is caught mid-file (trailer check) " +
       "and at EOF (fit check); truncated payload never throws") {
    val good = rec("response", "https://a.org/crawl-1", "first payload ok")
    // mid-file: stated length swallows the next record's head — the
    // violation counts and resync recovers the swallowed record
    val over = rec("response", "https://a.org/crawl-2", "abc", Some(40))
    val next = rec("response", "https://a.org/crawl-3", "tail record data")
    val mid = parse(good + over + next)
    assert(mid.getAs[Int]("n_recs") == 2 && mid.getAs[Int]("n_bad") == 1)
    // at EOF: payload extends past the end of the file; no magic left
    // to resync to — earlier records kept
    val eof = parse(good + rec("response", "https://a.org/crawl-2",
      "short", Some(500)))
    assert(eof.getAs[Int]("n_recs") == 1 && eof.getAs[Int]("n_bad") == 1)
    // physically truncated file (record cut mid-payload)
    val full = good + rec("response", "https://a.org/crawl-2", "cut me off")
    val trunc = parse(full.dropRight(8))
    assert(trunc.getAs[Int]("n_recs") == 1 && trunc.getAs[Int]("n_bad") == 1)
  }

  test("two violations in one file: both count, both healthy neighbors " +
       "parse (n_bad is a COUNT, not a flag)") {
    val r = parse(
      rec("response", "https://a.org/crawl-1", "alpha payload") +
        rec("response", "https://a.org/crawl-2", "x", Some("XX")) +
        rec("response", "https://a.org/crawl-3", "beta payload") +
        rec("response", "https://a.org/crawl-4", "y", Some("ZZ")) +
        rec("response", "https://a.org/crawl-5", "gamma payload"))
    assert(r.getAs[Int]("n_recs") == 3 && r.getAs[Int]("n_bad") == 2)
    val recs = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("recs"))
    assert(recs.map(_.getAs[String]("payload")) ==
      Seq("alpha payload", "beta payload", "gamma payload"))
  }

  test("hitting the record bound with bytes unread flags the file " +
       "malformed — truncation is never silent") {
    val five = (1 to 5).map(i =>
      rec("response", s"https://a.org/crawl-$i", s"payload number $i"))
      .mkString("")
    val r = Warc.parseWarc(Seq((1, five)).toDF("gid", "wf"),
      maxRecords = 4).head
    assert(r.getAs[Int]("n_recs") == 4 && r.getAs[Int]("n_bad") == 1)
    // exactly at the bound is a clean parse
    val four = (1 to 4).map(i =>
      rec("response", s"https://a.org/crawl-$i", s"payload number $i"))
      .mkString("")
    val ok = Warc.parseWarc(Seq((1, four)).toDF("gid", "wf"),
      maxRecords = 4).head
    assert(ok.getAs[Int]("n_recs") == 4 && ok.getAs[Int]("n_bad") == 0)
  }

  test("bad magic and missing header terminator are malformed, not errors") {
    val r1 = parse("HTTP/1.1 200 OK\r\n\r\nnot a warc file at all")
    assert(r1.getAs[Int]("n_recs") == 0 && r1.getAs[Int]("n_bad") == 1)
    val r2 = parse("WARC/1.0\r\nWARC-Type: response") // EOF inside header
    assert(r2.getAs[Int]("n_recs") == 0 && r2.getAs[Int]("n_bad") == 1)
    assert(parse("").getAs[Int]("n_recs") == 0)
  }

  test("responses(): request records are framed past but filtered out; " +
       "doc_id/domain recover from the URI; body splits off HTTP headers") {
    val wf = rec("request", "https://www.a.org/crawl-7", "GET / HTTP/1.1") +
      rec("response", "https://www.a.org/crawl-9",
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>the body</p>")
    val parsed = Warc.parseWarc(Seq((4, wf)).toDF("gid", "wf"))
    val out = Warc.responses(parsed).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("doc_id") == 9L)
    assert(out(0).getAs[String]("domain") == "a.org")
    assert(out(0).getAs[String]("body") == "<p>the body</p>")
    assert(out(0).getAs[Int]("n_recs") == 2) // the request still counted
    assert(out(0).getAs[Int]("ridx") == 2)
  }

  test("generator plants: corrupt classes poison exactly their files; " +
       "chain output matches extraction of the same skeleton") {
    val docs = Seq(
      (11L, "bad length doc", "src0", "en"),     // id%23==11 -> XX length
      (17L, "over length doc", "src1", "en"),    // id%23==17 -> +50
      (7L,  "request doc", "src2", "en"),        // id%11==7 -> request
      (5L,  "plain response words", "src3", "en"))
      .toDF("doc_id", "text", "source", "lang")
    // explicit nFiles puts each doc in its own file so corruption
    // isolation is observable; the declared chain keys files by
    // consecutive id blocks instead (doc_id div 32, records/file ≤32
    // at every sf with no corpus-count join)
    val out = operators.Warc.parseWarcChain(docs, nFiles = Some(4096))
      .orderBy("doc_id").collect()
    // (single-record files: each corrupt record is alone, nothing to
    // resync to — isolation semantics unchanged)
    // 11 and 17 poison their (single-record) files; 7 is filtered as a
    // request; only 5 survives as a parsed response
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L))
    assert(out(0).getAs[Int]("n_bad") == 0)
    // derived keying: 4 records fold into ONE file (ids all < 32),
    // records parse in doc_id order; the corrupt 11 counts a
    // violation and resync recovers 17 — whose over-stated length is
    // the SECOND violation (it is last, nothing to resync to). The
    // healthy 5 and the request 7 parse; n_bad counts both.
    val derived = operators.Warc.parseWarcChain(docs)
      .orderBy("doc_id").collect()
    assert(derived.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L))
    assert(derived(0).getAs[Int]("n_bad") == 2)
    assert(derived(0).getAs[Int]("n_recs") == 2)
    assert(out(0).getAs[String]("domain") == "src3.example.com")
    // extraction stats equal the markup operator run directly on the
    // same generated page
    val direct = operators.Extract.extractHtml(
      operators.Extract.htmlWrapped(
        docs.filter($"doc_id" === 5L), "doc_id", "text"),
      "doc_id", "html").head
    assert(out(0).getAs[Int]("n_kept") == direct.getAs[Int]("n_kept"))
    assert(out(0).getAs[Int]("n_words") == direct.getAs[Int]("n_words"))
  }
}
