package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sitemap

class SitemapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def parse(xml: String) =
    Sitemap.parseSitemap(Seq(("s1", xml)).toDF("src", "xml"))

  test("entries parse with optional fields null when absent; loc-less " +
       "entries are counted and skipped, never thrown on") {
    val xml = "<?xml version=\"1.0\"?><urlset>" +
      "<url><loc>https://www.a.org/en/page-3</loc>" +
      "<lastmod>2026-08-04</lastmod><priority>0.3</priority></url>" +
      "<url>\n  <loc>https://a.org/de/page-7</loc>\n</url>" + // multiline
      "<url><!-- draft, loc pending --></url>" +
      "</urlset>"
    val out = parse(xml).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("doc_id") == 3L)
    assert(out(0).getAs[String]("host") == "a.org") // www stripped
    assert(out(0).getAs[String]("lastmod") == "2026-08-04")
    assert(out(0).getAs[Double]("priority") == 0.3)
    assert(out(1).getAs[Long]("doc_id") == 7L)
    assert(out(1).isNullAt(out(1).fieldIndex("lastmod")))
    assert(out(1).isNullAt(out(1).fieldIndex("priority")))
    assert(out(0).getAs[Int]("n_entries") == 2)
    assert(out(0).getAs[Int]("n_skipped") == 1)
  }

  test("an entry-free or junk-only sitemap yields zero rows, no error") {
    assert(parse("<urlset></urlset>").count() == 0)
    assert(parse("<urlset><url><!-- x --></url></urlset>").count() == 0)
    assert(parse("not xml at all").count() == 0)
  }

  test("generator round trip: every doc surfaces once with its host; " +
       "every third doc has a null lastmod") {
    val docs = Seq((3L, "src0", "en"), (4L, "src0", "de"), (9L, "src1", "fr"))
      .toDF("doc_id", "source", "lang")
    val out = Sitemap.parseSitemap(
        Sitemap.sitemapWrapped(docs, "doc_id", "source", "lang"))
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(3L, 4L, 9L))
    assert(out(0).isNullAt(out(0).fieldIndex("lastmod"))) // 3 % 3 == 0
    assert(out(1).getAs[String]("lastmod") == "2026-08-05")
    assert(out(2).getAs[String]("host") == "src1.example.com")
    // each sitemap counts its planted draft entry
    assert(out.forall(_.getAs[Int]("n_skipped") == 1))
  }
}
