package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ingest

class IngestSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("JSON round trip survives escaping-hostile text") {
    val nasty = "he said \"hi\\there\"\nnew\tline / unicode é end"
    val docs = Seq((1L, nasty, "web", "en")).toDF("doc_id", "text", "source", "lang")
    val out = Ingest.parseJsonl(
      Ingest.jsonlWrapped(docs, "doc_id", "text", "source", "lang")).head
    assert(out.getAs[Int]("valid") == 1)
    assert(out.getAs[Int]("n_text_chars") == nasty.length)
    assert(out.getAs[String]("source") == "web")
    assert(out.getAs[String]("tag2") == "b-1")
  }

  test("truncated lines surface as valid=0 all-null rows, never throw") {
    val docs = (0L to 40L).map(i => (i, s"text $i", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val out = Ingest.parseJsonl(
      Ingest.jsonlWrapped(docs, "doc_id", "text", "source", "lang"))
      .collect().map(r => r.getLong(0) -> r).toMap
    (0L to 40L).foreach { i =>
      val r = out(i)
      if (i % 17 == 0) {
        assert(r.getAs[Int]("valid") == 0, s"doc $i")
        assert(r.isNullAt(r.fieldIndex("source")) &&
          r.isNullAt(r.fieldIndex("n_text_chars")) &&
          r.isNullAt(r.fieldIndex("score")), s"doc $i fields must be null")
      } else {
        assert(r.getAs[Int]("valid") == 1, s"doc $i")
        assert(r.getAs[Double]("score") == (i % 100) / 100.0)
      }
    }
  }

  test("a hand-written malformed line class (not just truncation) is dropped") {
    val lines = Seq(
      (1L, """{"id": 1, "meta": {"source": "s", "lang": "en"}, "text": "ok ok", "score": 0.5, "tags": ["a", "b"]}"""),
      (2L, """not json at all"""),
      (3L, """{"id": "WRONG-TYPE"}""")).toDF("doc_id", "line")
    val out = Ingest.parseJsonl(lines).collect()
      .map(r => r.getLong(0) -> r.getAs[Int]("valid")).toMap
    assert(out(1L) == 1 && out(2L) == 0 && out(3L) == 0, out.toString)
  }

  test("streaming twin equals the batch transform on the real corpus") {
    val sf = "/root/testdata/sf0.001"
    val batch = Queries.all.find(_.name == "q_parse_jsonl").get
      .run(spark, sf).collect()
    val live = streaming.CorpusStream.parseJsonlOverFile(spark, sf)
      .orderBy("doc_id").collect()
    assert(batch.toSeq == live.toSeq)
  }

  test("JSONL export: sharded write round-trips value-for-value, " +
    "shard membership is deterministic, re-export is byte-identical") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang", "source")
    val path = "/tmp/graft_jsonl_export"
    val n = Ingest.writeJsonl(docs, "doc_id", path, numShards = 4)
    assert(n == docs.count())
    def shardFiles() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(_.getName)
      .flatMap(d => d.listFiles().filter(_.getName.endsWith(".txt"))
        .sortBy(_.getName))
    val files = shardFiles()
    // 4 shard directories, one sorted file each
    assert(new java.io.File(path).listFiles()
      .count(_.getName.startsWith("shard=")) == 4)
    assert(files.length == 4)
    val back = Ingest.readJsonl(spark, path,
      "id BIGINT, text STRING, lang STRING, source STRING")
    assert(back.count() == n)
    // value-for-value: every original row comes back intact
    val orig = docs.collect().map(r => (r.getLong(0),
      Option(r.getString(1)).getOrElse(""), r.getString(2), r.getString(3))).toSet
    val got = back.collect().map(r => (r.getLong(0),
      Option(r.getString(1)).getOrElse(""), r.getString(2), r.getString(3))).toSet
    assert(got == orig)
    // deterministic delivery: a re-export writes byte-identical shards
    val digest1 = files.map(f => java.util.Arrays.hashCode(
      java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    Ingest.writeJsonl(docs, "doc_id", path, numShards = 4)
    val digest2 = shardFiles().map(f => java.util.Arrays.hashCode(
      java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    assert(digest1 == digest2)
    // shard membership is the modulo, not a hash accident
    val s0 = Ingest.readJsonl(spark, path + "/shard=0",
      "id BIGINT, text STRING, lang STRING, source STRING")
      .collect().map(_.getLong(0))
    assert(s0.nonEmpty && s0.forall(_ % 4 == 0))
  }
}
