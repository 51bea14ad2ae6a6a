package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Lines

class LinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def dedup(docs: Seq[(Long, String)], minDocs: Int = 2) =
    Lines.lineDedup(docs.toDF("doc_id", "content"), "doc_id", "content",
      minDocs)
      .orderBy("doc_id").collect()

  test("a line shared by two docs is removed from BOTH; unique lines stay") {
    val r = dedup(Seq(
      (1L, "follow us on social\nunique alpha body\nthe end one"),
      (2L, "follow us on social\nunique beta body\nthe end two")))
    assert(r(0).getAs[String]("content") ==
      "unique alpha body\nthe end one")
    assert(r(1).getAs[String]("content") ==
      "unique beta body\nthe end two")
    assert(r.forall(_.getAs[Int]("n_removed") == 1))
    assert(r.forall(_.getAs[Int]("n_lines") == 3))
  }

  test("within-doc repetition is NOT cross-doc boilerplate — both copies stay") {
    val r = dedup(Seq(
      (1L, "echo line\necho line\nmiddle text"),
      (2L, "other stuff\nmore other")))
    assert(r(0).getAs[String]("content") ==
      "echo line\necho line\nmiddle text")
    assert(r(0).getAs[Int]("n_removed") == 0)
  }

  test("order is preserved after removal, including interleaved dups") {
    val r = dedup(Seq(
      (1L, "dup\nkeep one\ndup\nkeep two\ndup"),
      (2L, "dup\nelse")))
    assert(r(0).getAs[String]("content") == "keep one\nkeep two")
    assert(r(0).getAs[Int]("n_removed") == 3)
  }

  test("a doc reduced to nothing yields empty content, counts intact") {
    val r = dedup(Seq(
      (1L, "all rights reserved"),
      (2L, "all rights reserved")))
    assert(r.forall(_.getAs[String]("content") == ""))
    assert(r.forall(_.getAs[Int]("n_lines") == 1))
    assert(r.forall(_.getAs[Int]("n_removed") == 1))
  }

  test("minDocs threshold: a 3-doc line survives minDocs=4") {
    val docs = Seq(
      (1L, "banner\na1"), (2L, "banner\na2"), (3L, "banner\na3"))
    assert(dedup(docs, minDocs = 4)
      .forall(_.getAs[Int]("n_removed") == 0))
    assert(dedup(docs, minDocs = 3)
      .forall(_.getAs[Int]("n_removed") == 1))
  }

  test("stream twin: first occurrence keeps, later copies drop — " +
    "including within-doc repeats (the documented batch divergence)") {
    import org.apache.spark.sql.functions.timestamp_micros
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq(
      (1L, "shared banner\nalpha body\necho\necho"),
      (2L, "shared banner\nbeta body"),
      (3L, "tail doc never emits"))
      .toDF("doc_id", "content")
      .withColumn("ts", timestamp_micros((lit(1704067200L) + col("doc_id")) * lit(1000000L)))
    // coalesce, not repartition: the first-occurrence assertions need
    // the fixture written in row order (repartition's round-robin
    // shuffle does not guarantee it)
    docs.coalesce(1).write.mode("overwrite")
      .parquet("/tmp/graft_linestream_fixture")
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet("/tmp/graft_linestream_fixture")
    val name = "__graft_linespec"
    val q = graft.streaming.CorpusStream.lineDedupStream(stream,
        watermark = "0 seconds", window = "1 second")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val r = spark.table(name).orderBy("doc_id").collect()
    // doc 3 (max ts) never emits under the 0s-watermark scheme
    assert(r.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    // doc 1 arrives first: keeps the banner, alpha, and ONE echo —
    // the within-doc repeat drops (stream rule), unlike the batch
    // operator which keeps both copies
    assert(r(0).getAs[String]("content") == "shared banner\nalpha body\necho")
    assert(r(0).getAs[Int]("n_removed") == 1)
    // doc 2 loses the banner to doc 1's copy
    assert(r(1).getAs[String]("content") == "beta body")
    assert(r(1).getAs[Int]("n_removed") == 1)
    val batch = Lines.lineDedup(docs.select("doc_id", "content"),
      "doc_id", "content").orderBy("doc_id").collect()
    // batch: retroactive removal — the banner vanishes from BOTH docs,
    // but doc 1's within-doc echo pair survives
    assert(batch(0).getAs[String]("content") == "alpha body\necho\necho")
  }

  test("linesWrapped plant: source banner + tag shared, closing note unique, " +
    "id%9 doubles the closing line") {
    val docs = Seq(
      (0L, "text zero", "srcA"), (9L, "text nine", "srcA"),
      (2L, "text two", "srcB"), (6L, "text six", "srcB"))
      .toDF("doc_id", "text", "source")
    val w = Lines.linesWrapped(docs, "doc_id", "text", "source")
    val r = Lines.lineDedup(w, "doc_id", "content").orderBy("doc_id").collect()
    // id=0: 5 lines (dup closing note), banner+tag(0%4=0 unique among
    // {0,1,2,2}? tags are 0,1,2,2 -> tag 2 shared by docs 2,6) ...
    val byId = r.map(x => x.getAs[Long]("doc_id") -> x).toMap
    // banners: srcA shared by {0,9}, srcB by {2,6} -> removed everywhere
    assert(r.forall(x => !x.getAs[String]("content").contains("newsletter")))
    // doc 0: lines = banner, text, tag 0, note, note -> tag 0 unique, kept;
    // the doubled closing note survives (within-doc only)
    assert(byId(0L).getAs[String]("content") ==
      "text zero\ntag 0\nclosing note 0\nclosing note 0")
    assert(byId(0L).getAs[Int]("n_lines") == 5)
    assert(byId(0L).getAs[Int]("n_removed") == 1)
    // docs 2 and 6 share tag 2 -> removed from both
    assert(byId(2L).getAs[String]("content") == "text two\nclosing note 2")
    assert(byId(6L).getAs[String]("content") == "text six\nclosing note 6")
  }
}
