package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Multimodal plumbing tests: the decode stub is fake by design, but
  * schema contracts, batching, determinism, and fan-out shape are real. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val media = Media.synthetic(spark, 30).cache()

  test("decodeFeatures: schema keeps all non-binary cols + fixed-dim features") {
    val out = Media.decodeFeatures(media, dim = 32)
    assert(out.columns.toSeq == Seq("media_id", "kind", "meta", "features"))
    val lens = out.select(size(col("features"))).distinct().collect().map(_.getInt(0))
    assert(lens.toSeq == Seq(32))
    assert(out.count() == 30)
  }

  test("decodeFeatures is deterministic and content-sensitive") {
    val a = Media.decodeFeatures(media, 16).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = Media.decodeFeatures(media, 16).select("media_id", "features")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b)
    assert(a(0L) != a(1L))   // different bytes -> different features
  }

  test("resize rewrites metadata and preserves rows") {
    val out = Media.resize(media, 224, 224)
    assert(out.count() == 30)
    val metas = out.select("meta.width", "meta.height").distinct().collect()
    assert(metas.length == 1 && metas(0).getInt(0) == 224)
    // sample_rate untouched
    assert(out.select("meta.sample_rate").distinct().head.getInt(0) == 16000)
  }

  test("sampleFrames fans out video rows only, stride respected") {
    val out = Media.sampleFrames(media, stride = 4, dim = 8)
    val videos = media.filter(col("kind") === "video").count()
    // n_frames=12, stride 4 -> indices 0,4,8 = 3 frames per video
    assert(out.count() == videos * 3)
    val idx = out.select("frame_idx").distinct().collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == Seq(0, 4, 8))
    // frames of the same media differ (frame-salted stub decode)
    val one = out.filter(col("media_id") === 2).collect()
      .map(_.getSeq[Float](2)).toSeq
    assert(one.distinct.size == one.size)
  }

  test("media_features declared query: one row per doc, videos carry sampled frames") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("media_features")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.length == nDocs)
    // kind cycles by doc_id % 3; every video doc with >= 1 token gets
    // >= 1 sampled frame, non-videos get exactly 0
    out.foreach { r =>
      val isVideo = r.getString(1) == "video"
      val n = r.getLong(4)
      if (isVideo) assert(n >= 1, s"video row $r has no frames")
      else assert(n == 0, s"non-video row $r has frames")
      assert(r.getDouble(2) > 0.0) // norm of the 16-dim stub features
    }
  }

  test("media_embed_topk: decode -> embed -> top-k flow, deterministic") {
    val run = () => SparkEntry.queries("media_embed_topk")(
      spark, "/root/testdata/sf0.001").collect().map(_.toString)
    val out = run()
    assert(out.length == 100, s"expected 10 queries x 10 neighbors, got ${out.length}")
    assert(run().sameElements(out), "media retrieval must be deterministic")
    // identical texts decode to identical vectors -> an exact-dup doc
    // must surface as some query's cos = 1.0 neighbor (the corpus has
    // exact dups; if none land in the query set this still holds for
    // at least self-similar content). Weak check: all cos in [-1, 1].
    val r = SparkEntry.queries("media_embed_topk")(spark, "/root/testdata/sf0.001")
      .collect()
    r.foreach(row => assert(math.abs(row.getDouble(2)) <= 1.0 + 1e-9))
    r.foreach(row => assert(row.getLong(0) != row.getLong(1)))
  }
}
