package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Codecs, Media}

/** Multimodal tests: REAL byte-exact codec coverage for the three
  * dependency-free formats (PNG, Netpbm P5/P6, PCM WAV) plus the
  * plumbing contracts (schema, batching, determinism, fan-out) that
  * also cover the unknown-container stub fallback. */
class MediaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val media = Media.synthetic(spark, 30).cache()

  // -- real codecs, byte-exact ------------------------------------------

  test("decodePgm parses a hand-written P5 fixture byte-exactly") {
    val raster = Array[Byte](0, 51, 102, -103, 17, 34, 68, -1) // 153, 255 as signed
    val bytes = "P5\n4 2\n255\n".getBytes("US-ASCII") ++ raster
    val img = Codecs.decodePgm(bytes)
    assert(img.width == 4 && img.height == 2)
    val expected = Array(0, 51, 102, 153, 17, 34, 68, 255).map(_ / 255f)
    assert(img.gray.sameElements(expected))
  }

  test("decodePgm handles header comments and arbitrary whitespace") {
    val bytes = "P5 # a comment\n# another\n 2\t2 # dims\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40)
    val img = Codecs.decodePgm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(img.gray.sameElements(Array(10, 20, 30, 40).map(_ / 255f)))
  }

  test("encodePgm -> decodePgm round-trips and re-encodes byte-identically") {
    val px = Array.tabulate[Byte](12 * 5)(i => ((i * 37) % 256).toByte)
    val enc = Codecs.encodePgm(px, 12, 5)
    val img = Codecs.decodePgm(enc)
    assert(img.width == 12 && img.height == 5)
    val back = Codecs.encodePgm(
      img.gray.map(g => math.round(g * 255f).toByte), 12, 5)
    assert(back.sameElements(enc), "decode->re-encode must be byte-identical")
  }

  test("decodePpm reduces RGB to Rec.601 luminance") {
    val raster = Array[Byte](-1, 0, 0, /**/ 0, -1, 0, /**/ 0, 0, -1, /**/ -1, -1, -1)
    val bytes = "P6\n2 2\n255\n".getBytes("US-ASCII") ++ raster
    val img = Codecs.decodePpm(bytes)
    assert(img.width == 2 && img.height == 2)
    assert(math.abs(img.gray(0) - 0.299f) < 1e-6)
    assert(math.abs(img.gray(1) - 0.587f) < 1e-6)
    assert(math.abs(img.gray(2) - 0.114f) < 1e-6)
    assert(math.abs(img.gray(3) - 1.0f) < 1e-6)
  }

  test("resizePgm nearest-neighbour downsample is exact") {
    // 4x4 with distinct quadrant values; 2x2 NN picks the top-left of each
    val px = Array[Byte](
      10, 10, 20, 20,
      10, 10, 20, 20,
      30, 30, 40, 40,
      30, 30, 40, 40)
    val small = Codecs.decodePgm(Codecs.resizePgm(Codecs.encodePgm(px, 4, 4), 2, 2))
    assert(small.width == 2 && small.height == 2)
    assert(small.gray.sameElements(Array(10, 20, 30, 40).map(_ / 255f)))
  }

  // -- PNG: hand-built fixtures over the full filter algebra ------------

  /** Assemble a PNG from raw (filtered) scanlines — the fixture
    * builder: deflate + chunk + CRC exactly per spec, so the decoder
    * is tested against independently-constructed bytes, not its own
    * encoder. */
  private def buildPng(w: Int, h: Int, colorType: Int, raw: Array[Byte]): Array[Byte] = {
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val z = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) z.write(buf, 0, defl.deflate(buf))
    defl.end()
    val zd = z.toByteArray
    val bb = java.nio.ByteBuffer.allocate(8 + 25 + 12 + zd.length + 12)
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).foreach(s => bb.put(s.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      bb.putInt(data.length)
      val t = typ.getBytes("US-ASCII")
      bb.put(t).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      bb.putInt(crc.getValue.toInt)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(colorType.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array())
    chunk("IDAT", zd)
    chunk("IEND", Array.emptyByteArray)
    bb.array()
  }

  test("decodePng reconstructs all four non-trivial filters (Sub/Up/Average/Paeth) byte-exactly") {
    // 3x4 gray image, one row per filter type; expected recon computed
    // by hand from the spec's algebra (a = left, b = up, c = up-left)
    val raw = Array[Byte](
      1, 10, 20, 30, // Sub:     10, 30, 60
      2, 5, 10, 15,  // Up:      15, 40, 75
      3, 4, 6, 8,    // Average: 11, 31, 61
      4, 1, 2, 3)    // Paeth:   12, 33, 64
    val img = Codecs.decodePng(buildPng(3, 4, colorType = 0, raw))
    assert(img.width == 3 && img.height == 4)
    val expected = Array(10, 30, 60, 15, 40, 75, 11, 31, 61, 12, 33, 64).map(_ / 255f)
    assert(img.gray.sameElements(expected),
      s"got ${img.gray.map(g => math.round(g * 255)).mkString(",")}")
  }

  test("decodePng reduces RGB (color type 2) to Rec.601 luminance") {
    val raw = Array[Byte](
      0, -1, 0, 0,  // (255,0,0) -> .299
      0, 0, -1, 0)  // (0,255,0) -> .587
    val img = Codecs.decodePng(buildPng(1, 2, colorType = 2, raw))
    assert(math.abs(img.gray(0) - 0.299f) < 1e-6)
    assert(math.abs(img.gray(1) - 0.587f) < 1e-6)
  }

  test("encodePngGray -> decodePng round-trips pixels byte-exactly") {
    val px = Array.tabulate[Byte](17 * 9)(i => ((i * 41) % 256).toByte)
    val enc = Codecs.encodePngGray(px, 17, 9)
    assert(Codecs.detect(enc) == Codecs.Png)
    val img = Codecs.decodePng(enc)
    assert(img.width == 17 && img.height == 9)
    assert(img.gray.map(g => math.round(g * 255f).toByte).sameElements(px))
  }

  test("decodePng rejects corruption loudly: flipped IDAT bit fails CRC, not garbage pixels") {
    val enc = Codecs.encodePngGray(Array.fill[Byte](16)(42), 4, 4)
    // flip one bit inside the IDAT payload (byte 8+25+8+2 is comfortably
    // inside the zlib stream)
    val bad = enc.clone(); bad(8 + 25 + 8 + 2) = (bad(8 + 25 + 8 + 2) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException](Codecs.decodePng(bad))
    assert(e.getMessage.contains("CRC"))
  }

  test("decodeWav parses a hand-built PCM16 file byte-exactly, skipping extra chunks") {
    // RIFF | LIST (odd-sized, word-aligned) | fmt | data
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 1)
    val data = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(data.putShort)
    val list = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 'x', 'y', 'z', 0) // padded
    val fmt = java.nio.ByteBuffer.allocate(24).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    val body = list ++ fmt.array() ++
      "data".getBytes("US-ASCII") ++
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(samples.length * 2).array() ++ data.array()
    val riff = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(4 + body.length)
      .put("WAVE".getBytes("US-ASCII"))
    val audio = Codecs.decodeWav(riff.array() ++ body)
    assert(audio.sampleRate == 8000)
    assert(audio.samples.sameElements(samples.map(_.toFloat / 32768f)))
  }

  test("encodeWav -> decodeWav round-trips samples exactly") {
    val samples = Array.tabulate[Short](300)(i => (math.sin(i * 0.1) * 20000).toShort)
    val audio = Codecs.decodeWav(Codecs.encodeWav(samples, 16000))
    assert(audio.sampleRate == 16000)
    assert(audio.samples.sameElements(samples.map(_.toFloat / 32768f)))
  }

  test("realDecode dispatches: real pixels for PGM/PNG, real RMS for WAV, stub for unknown") {
    // constant-gray image: every pooled block mean = 100/255
    val img = Codecs.encodePgm(Array.fill[Byte](64)(100), 8, 8)
    assert(Media.realDecode(img, 4).forall(f => math.abs(f - 100 / 255f) < 1e-6))
    // the PNG container of the same pixels must decode identically
    val png = Codecs.encodePngGray(Array.fill[Byte](64)(100), 8, 8)
    assert(Media.realDecode(png, 4).sameElements(Media.realDecode(img, 4)))
    // constant-amplitude audio: every pooled RMS = 0.25
    val wav = Codecs.encodeWav(Array.fill[Short](64)(8192), 16000)
    assert(Media.realDecode(wav, 4).forall(f => math.abs(f - 0.25f) < 1e-6))
    // unknown container: exactly the stub's output
    val blob = Array[Byte](1, 2, 3, 4, 5)
    assert(Media.realDecode(blob, 8).sameElements(Media.fakeDecode(blob, 8)))
  }

  test("fromDocuments wraps text into genuine containers that really decode") {
    import spark.implicits._
    val docs = Seq((0L, "an image document"), (1L, "an audio document"),
                   (2L, "a video document with several words here"),
                   (3L, "an image document"))
      .toDF("doc_id", "text")
    val rows = Media.fromDocuments(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    // doc 0 (id % 6 == 0) ships as standard PNG, doc 3 as binary P5 —
    // same text, same pixels, so the container choice is feature-neutral
    val pngBytes = rows(0L).getAs[Array[Byte]](2)
    assert(Codecs.detect(pngBytes) == Codecs.Png)
    val png = Codecs.decodePng(pngBytes)
    assert(png.width == 64 && png.height == 48)
    // pixel 0 is 'a' = 97, cycled from the text bytes
    assert(math.abs(png.gray(0) - 97 / 255f) < 1e-6)
    val pgmBytes = rows(3L).getAs[Array[Byte]](2)
    assert(Codecs.detect(pgmBytes) == Codecs.Pgm)
    assert(Codecs.decodePgm(pgmBytes).gray.sameElements(png.gray),
      "PNG and P5 rows of the same text must decode to identical pixels")
    val wavBytes = rows(1L).getAs[Array[Byte]](2)
    assert(Codecs.detect(wavBytes) == Codecs.Wav)
    val audio = Codecs.decodeWav(wavBytes)
    assert(audio.sampleRate == 16000 && audio.samples.length >= 16)
    // sample 0 from 'a': ((97 - 128) << 8) / 32768
    assert(math.abs(audio.samples(0) - ((97 - 128) << 8) / 32768f) < 1e-6)
    assert(Codecs.detect(rows(2L).getAs[Array[Byte]](2)) == Codecs.Unknown)
  }

  test("resize really resamples PGM and PNG bytes, passes other containers through") {
    import spark.implicits._
    val docs = Seq((0L, "image text"), (3L, "image text"), (1L, "audio text"))
      .toDF("doc_id", "text")
    val out = Media.resize(Media.fromDocuments(docs, "doc_id", "text"), 32, 32)
      .collect().map(r => r.getLong(0) -> r).toMap
    val png = Codecs.decodePng(out(0L).getAs[Array[Byte]](2))
    assert(png.width == 32 && png.height == 32, "PNG bytes must really resample")
    val img = Codecs.decodePgm(out(3L).getAs[Array[Byte]](2))
    assert(img.width == 32 && img.height == 32, "P5 bytes must really resample")
    assert(img.gray.sameElements(png.gray),
      "resampled PNG and P5 of identical pixels must stay identical")
    assert(Codecs.detect(out(1L).getAs[Array[Byte]](2)) == Codecs.Wav,
      "non-image bytes pass through")
    assert(out(0L).getStruct(3).getInt(0) == 32)
  }

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
