package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.{Codecs, Media}

/** Multimodal tests: REAL byte-exact codec coverage for the
  * dependency-free formats (PNG, baseline JPEG, Netpbm P5/P6, PCM
  * WAV, AVI video with DIB/MJPEG frames) plus the plumbing contracts
  * (schema, batching, determinism, fan-out) that also cover the
  * unknown-container stub fallback. */
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


  // -- baseline JPEG --------------------------------------------------

  /** A 24x16 grayscale baseline JPEG (single component, JFIF) produced
    * once by the JDK's ImageIO encoder from the deterministic pattern
    * v = (x*10 + y*7 + ((x*y)%13)*5) % 256 — embedded so the
    * regression pin is byte-fixed, independent of any encoder present
    * at test time. */
  private val jpegGrayFixture: Array[Byte] = {
    val hex =
    "ffd8ffe000104a46494600010200000100010000ffdb0043000806060706050807070709" +
    "09080a0c140d0c0b0b0c1912130f141d1a1f1e1d1a1c1c20242e2720222c231c1c283729" +
    "2c30313434341f27393d38323c2e333432ffc0000b080010001801011100ffc4001f0000" +
    "010501010101010100000000000000000102030405060708090a0bffc400b51000020103" +
    "03020403050504040000017d01020300041105122131410613516107227114328191a108" +
    "2342b1c11552d1f02433627282090a161718191a25262728292a3435363738393a434445" +
    "464748494a535455565758595a636465666768696a737475767778797a83848586878889" +
    "8a92939495969798999aa2a3a4a5a6a7a8a9aab2b3b4b5b6b7b8b9bac2c3c4c5c6c7c8c9" +
    "cad2d3d4d5d6d7d8d9dae1e2e3e4e5e6e7e8e9eaf1f2f3f4f5f6f7f8f9faffda00080101" +
    "00003f00e4bc2fa0c1f66889891a465ce48ce33d001ebd3f4e0e6bd4746d1237582330c6" +
    "81a4077ec0bc60e413d3fc83587f113c426c7ccd3f4e9aeecb6e510a192090cc9d4aba0e" +
    "3fd621647c8640586cfddbcb2786f4f5786131c12b0445df9518e07241cf1c7ff5c574ba" +
    "bea9258417167a75ddb5a6af69663543f6a8da48cdbabe246728a7395575c0f9b9e31c11" +
    "e2599352d665996d205837b2c115aee8edc2ee2c7cb5918b2a1662fb78e5ba0e83ffd9"

    hex.grouped(2).map(s => Integer.parseInt(s, 16).toByte).toArray
  }

  test("decodeJpeg: fixed gray fixture decodes byte-exactly (regression pin) " +
       "and matches the JDK decoder within IDCT tolerance") {
    assert(Codecs.detect(jpegGrayFixture) == Codecs.Jpeg)
    val img = Codecs.decodeJpeg(jpegGrayFixture)
    assert(img.width == 24 && img.height == 16)
    val ourPx = img.gray.map(g => math.round(g * 255f).toByte)
    // regression pin: our decoder's exact output on the fixed bytes
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(ourPx).map(b => f"$b%02x").mkString
    assert(md == "5339b8e479a92d13d996d765c4b5d8f7",
      s"pinned fixture decode changed: md5=$md")
    // independent cross-check: the JDK's decoder on the same bytes —
    // T.81 bounds IDCT accuracy instead of mandating bit-exactness,
    // so two conforming decoders may differ by +-1/255 per pixel
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpegGrayFixture))
    assert(jdk != null, "JDK could not read the fixture")
    assert(jdk.getWidth == 24 && jdk.getHeight == 16)
    var maxDiff = 0
    for (y <- 0 until 16; x <- 0 until 24) {
      val ours = ourPx(y * 24 + x) & 0xff
      val ref = jdk.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(ours - ref))
    }
    assert(maxDiff <= 1, s"gray decode diverges from the JDK by $maxDiff/255")
  }

  test("decodeJpeg: 4:2:0 color JPEG — luma plane matches the JDK's within tolerance, " +
       "chroma blocks consumed correctly") {
    // encode a color image at test time with the JDK (3 components,
    // subsampled chroma -> multi-block MCUs whose Cb/Cr bits must be
    // entropy-consumed even though only Y is kept)
    val w = 19; val h = 13
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 13 + y * 3) % 256; val g = (x * 5 + y * 11) % 256
      val b = (x * 7 + y * 17) % 256
      bi.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bo), "JDK JPEG writer unavailable")
    val bytes = bo.toByteArray
    assert(Codecs.detect(bytes) == Codecs.Jpeg)
    val img = Codecs.decodeJpeg(bytes)
    assert(img.width == w && img.height == h)
    // luma of the JDK's reconstructed RGB equals the coded Y up to
    // rounding/clamping through the color transform (+-3/255)
    val jdk = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0.0
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = jdk.getRGB(x, y)
      val luma = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
      maxDiff = math.max(maxDiff, math.abs(img.gray(y * w + x) * 255.0 - luma))
    }
    assert(maxDiff <= 3.0, s"color-JPEG luma diverges from the JDK by $maxDiff/255")
  }

  test("decodeJpeg rejects progressive loudly") {
    // minimal SOI + SOF2 header — must fail on the frame type, not parse on
    val sof2 = Array[Int](0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 16, 0, 16, 1, 1, 0x11, 0).map(_.toByte)
    val e = intercept[IllegalArgumentException](Codecs.decodeJpeg(sof2))
    assert(e.getMessage.contains("progressive"))
  }

  test("jpeg: realDecode + decodeFeatures treat a real JPEG row as genuine pixels, " +
       "resize re-encodes the luma plane") {
    import org.apache.spark.sql.Row
    // features = pooled means of OUR decode, not the stub
    val feats = Media.realDecode(jpegGrayFixture, 8)
    val expected = Codecs.decodeJpeg(jpegGrayFixture).gray
    val pooled = Array.tabulate(8) { i =>
      val seg = expected.slice(i * expected.length / 8, (i + 1) * expected.length / 8)
      seg.sum / seg.length
    }
    assert(feats.zip(pooled).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    assert(!feats.sameElements(Media.fakeDecode(jpegGrayFixture, 8)),
      "JPEG row fell through to the stub")
    // through the Spark plumbing: media_features-shaped decode over a
    // real JPEG row yields those same features
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, "image", jpegGrayFixture, Row(24, 16, 0, 0))), 1),
      Media.mediaSchema)
    val out = Media.decodeFeatures(df, dim = 8).collect()
    assert(out.length == 1)
    val sparkFeats = out(0).getAs[scala.collection.Seq[Float]]("features")
    assert(sparkFeats.zip(feats).forall { case (a, b) => math.abs(a - b) < 1e-6 })
    // resize: decode -> nearest-neighbour -> gray PNG container
    val resized = Codecs.resizeJpeg(jpegGrayFixture, 12, 8)
    assert(Codecs.detect(resized) == Codecs.Png)
    val rimg = Codecs.decodePng(resized)
    assert(rimg.width == 12 && rimg.height == 8)
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
    // doc 2 ships as a genuine uncompressed-DIB AVI: one frame per
    // word (7 here), 16x12, pixel (0,0) of frame f is cyc(7*f)
    val aviBytes = rows(2L).getAs[Array[Byte]](2)
    assert(Codecs.detect(aviBytes) == Codecs.Avi)
    val vid = Codecs.parseAvi(aviBytes)
    assert(vid.width == 16 && vid.height == 12 && vid.frames.length == 7)
    assert(rows(2L).getStruct(3).getInt(3) == 7, "meta.n_frames from container")
    val vtext = "a video document with several words here"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val f0 = Codecs.decodeVideoFrame(vid, 0)
    val f1 = Codecs.decodeVideoFrame(vid, 1)
    assert(math.abs(f0.gray(0) - (vtext(0) & 0xff) / 255f) < 1e-3)
    assert(math.abs(f1.gray(0) - (vtext(7) & 0xff) / 255f) < 1e-3)
    assert(!f0.gray.sameElements(f1.gray), "frame content must drift")
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

  // -- audio frame analysis (native expressions) ------------------------

  test("FrameEnergy: hand-built fixture is byte-exact; short clips " +
       "yield empty arrays; codegen and interpreted agree bitwise") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import spark.implicits._
    val s = Array(0.5, -0.5, 0.5, -0.5, 1.0, 0.0, 0.0, 0.0)
    // frames (len 4, hop 2): [.5 -.5 .5 -.5] [.5 -.5 1 0] [1 0 0 0]
    val expect = Array(
      math.sqrt((0.25 + 0.25 + 0.25 + 0.25) / 4),
      math.sqrt((0.25 + 0.25 + 1.0 + 0.0) / 4),
      math.sqrt((1.0 + 0.0 + 0.0 + 0.0) / 4))
    val df = Seq(Tuple1(s.toSeq)).toDF("samples")
      .select(graft.functions.AudioOps.frameEnergy(col("samples"), 4, 2).as("e"))
    val got = df.collect()(0).getSeq[Double](0).toArray
    assert(got.sameElements(expect), s"codegen path: ${got.toSeq} != ${expect.toSeq}")
    // interpreted eval (Literal child bypasses whole-stage codegen)
    val interp = graft.functions.FrameEnergy(
        Literal.create(s, ArrayType(DoubleType, containsNull = false)), 4, 2)
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(interp.sameElements(expect), "interpreted eval diverged")
    // a clip shorter than one frame is loudly empty, not half-padded
    val short = Seq(Tuple1(Seq(0.1, 0.2))).toDF("samples")
      .select(graft.functions.AudioOps.frameEnergy(col("samples"), 4, 2).as("e"))
    assert(short.collect()(0).getSeq[Double](0).isEmpty)
  }

  test("SpectralFlux: constant signal has ~zero flux (DC excluded); a " +
       "tone onset spikes it; codegen and interpreted agree bitwise") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import spark.implicits._
    val frameLen = 32; val hop = 32; val nBins = 8
    // frame 0: silence-ish constant; frame 1: pure tone at bin 2
    val s = Array.fill(frameLen)(0.3) ++
      Array.tabulate(frameLen)(i => math.sin(2 * math.Pi * 2 * i / frameLen))
    val df = Seq(Tuple1(s.toSeq)).toDF("samples")
      .select(graft.functions.AudioOps
        .spectralFlux(col("samples"), frameLen, hop, nBins).as("fx"))
    val fx = df.collect()(0).getSeq[Double](0).toArray
    assert(fx.length == 2)
    assert(fx(0) < 1e-9, s"constant frame must have ~zero flux, got ${fx(0)}")
    assert(fx(1) > 0.4, s"tone onset must spike the flux, got ${fx(1)}")
    val interp = graft.functions.SpectralFlux(
        Literal.create(s, ArrayType(DoubleType, containsNull = false)),
        frameLen, hop, nBins)
      .eval(null).asInstanceOf[ArrayData].toDoubleArray()
    assert(interp.sameElements(fx), "interpreted eval diverged from codegen")
    // a sustained tone (same spectrum both frames) has zero SECOND flux:
    // rectified difference of identical spectra
    val sustained = Array.tabulate(2 * frameLen)(
      i => math.sin(2 * math.Pi * 2 * i / frameLen))
    val fx2 = Seq(Tuple1(sustained.toSeq)).toDF("samples")
      .select(graft.functions.AudioOps
        .spectralFlux(col("samples"), frameLen, hop, nBins).as("fx"))
      .collect()(0).getSeq[Double](0).toArray
    assert(fx2(1) < 1e-9, s"sustained tone re-counted as onset: ${fx2(1)}")
  }

  test("decodeAudio: WAV rows decode to exact samples + sample rate; " +
       "non-audio rows are excluded") {
    import spark.implicits._
    val shorts = Array[Short](0, 8192, -8192, 32767, -32768, 100)
    val rows = Seq(
      (1L, "audio", Codecs.encodeWav(shorts, 8000)),
      (2L, "image", Codecs.encodePgm(Array.fill[Byte](16)(7), 4, 4)))
    val df = rows.toDF("media_id", "kind", "bytes")
    val got = Media.decodeAudio(df).collect()
    assert(got.length == 1 && got(0).getLong(0) == 1L)
    assert(got(0).getInt(1) == 8000)
    val samples = got(0).getSeq[Double](2).toArray
    assert(samples.sameElements(shorts.map(v => (v.toFloat / 32768f).toDouble)))
  }

  test("media_audio_features: one row per document, deterministic, " +
       "long docs frame up and carry positive energy") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("media_audio_features")(spark, sf)
      .collect().map(_.toString)
    val out = SparkEntry.queries("media_audio_features")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(run().sameElements(run()), "audio features must be deterministic")
    out.foreach { r =>
      val nFrames = r.getInt(2)
      assert(nFrames >= 0)
      if (nFrames > 0) {
        assert(r.getDouble(3) > 0.0, s"framed clip with zero peak energy: $r")
        assert(r.getDouble(4) > 0.0, s"framed clip with zero mean energy: $r")
        assert(r.getDouble(5) >= 0.0, s"negative rectified flux: $r")
      }
    }
    assert(out.exists(_.getInt(2) > 0), "no document framed up at all")
  }

  test("media_audio_topk: retrieval over decoded WAV features rides the " +
       "ANN serve shard, deterministic, no self-matches") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("media_audio_topk")(spark, sf)
      .collect().map(_.toString)
    val out = SparkEntry.queries("media_audio_topk")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(run().sameElements(run()), "audio retrieval must be deterministic")
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), s"self-match: $r")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  // -- AVI video ------------------------------------------------------

  test("parseAvi: hand-checked container walk — header fields and frame " +
       "payloads byte-exact, word alignment respected") {
    // two 3x2 gray frames; frame 1 has an ODD DIB size? DIB rows pad to
    // 4 bytes (3px*3B=9 -> 12), so sizes are even — exercise the odd-pad
    // path through the MJPEG wrapper below instead. Here: exact payloads.
    val fr0 = Array.tabulate[Byte](6)(i => (10 * i).toByte)
    val fr1 = Array.tabulate[Byte](6)(i => (10 * i + 5).toByte)
    val avi = Codecs.encodeAviDib(Seq(fr0, fr1), 3, 2, usPerFrame = 33333)
    assert(Codecs.detect(avi) == Codecs.Avi)
    val v = Codecs.parseAvi(avi)
    assert(v.width == 3 && v.height == 2)
    assert(v.usPerFrame == 33333 && v.nFramesDeclared == 2)
    assert(v.bitCount == 24 && v.compression == 0 && !v.topDown)
    assert(v.frames.length == 2)
    // frame payloads: bottom-up BGR24, stride 12 (3*3=9 padded to 12)
    val stride = 12
    assert(v.frames.forall(_.length == stride * 2))
    // pixel (0,0) of the IMAGE is the LAST stored row's first pixel
    val f0 = v.frames(0)
    assert((f0(stride) & 0xff) == 0 && (f0(stride + 1) & 0xff) == 0 &&
           (f0(stride + 2) & 0xff) == 0, "top image row stored second (bottom-up)")
    assert((f0(0) & 0xff) == 30, "bottom image row stored first")
  }

  test("decodeVideoFrame: DIB BGR24 decodes to exact Rec.601 luma, " +
       "bottom-up flip applied") {
    // hand-pack a single 2x2 frame: pure R, G, B, white — stored bottom-up
    val w = 2; val h = 2; val stride = (w * 3 + 3) & ~3 // 8
    val f = new Array[Byte](stride * h)
    // stored row 0 = image BOTTOM row: [blue, white]
    f(0) = -1; f(1) = 0; f(2) = 0;    f(3) = -1; f(4) = -1; f(5) = -1
    // stored row 1 = image TOP row: [red, green] (BGR order)
    f(stride) = 0; f(stride + 1) = 0; f(stride + 2) = -1
    f(stride + 3) = 0; f(stride + 4) = -1; f(stride + 5) = 0
    val v = Codecs.Video(w, h, 40000, 1, 24, 0, topDown = false, Vector(f))
    val img = Codecs.decodeVideoFrame(v, 0)
    assert(math.abs(img.gray(0) - 0.299f) < 1e-6) // top-left: red
    assert(math.abs(img.gray(1) - 0.587f) < 1e-6) // top-right: green
    assert(math.abs(img.gray(2) - 0.114f) < 1e-6) // bottom-left: blue
    assert(math.abs(img.gray(3) - 1.0f) < 1e-6)   // bottom-right: white
    // the same payload marked top-down flips vertically
    val td = Codecs.decodeVideoFrame(v.copy(topDown = true), 0)
    assert(math.abs(td.gray(0) - 0.114f) < 1e-6)
    assert(math.abs(td.gray(2) - 0.299f) < 1e-6)
  }

  test("MJPEG AVI: JDK-encoded JPEG frames round-trip through the " +
       "container and decode within IDCT tolerance") {
    val w = 24; val h = 16
    def frame(shift: Int): Array[Byte] = {
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) {
        val g = (x * 10 + y * 7 + shift) % 256
        bi.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bo = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "jpg", bo), "JDK JPEG writer unavailable")
      bo.toByteArray
    }
    val jf = Seq(frame(0), frame(64))
    val avi = Codecs.encodeAviMjpeg(jf, w, h)
    val v = Codecs.parseAvi(avi)
    assert(v.compression == Codecs.MjpgFourcc && v.frames.length == 2)
    // container transport is byte-exact
    assert(v.frames(0).sameElements(jf(0)) && v.frames(1).sameElements(jf(1)))
    // frames decode through OUR T.81 decoder; cross-check vs the JDK
    for (i <- 0 to 1) {
      val img = Codecs.decodeVideoFrame(v, i)
      assert(img.width == w && img.height == h)
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jf(i)))
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w) {
        val ours = math.round(img.gray(y * w + x) * 255f)
        maxDiff = math.max(maxDiff,
          math.abs(ours - jdk.getRaster.getSample(x, y, 0)))
      }
      assert(maxDiff <= 1, s"frame $i diverges from the JDK by $maxDiff/255")
    }
  }

  test("decodeMjpegFrame: a DHT-less frame (the MJPEG convention) " +
       "decodes via the spliced Annex K.3 default tables") {
    // The JDK writer emits the K.3 standard tables for non-optimized
    // encodes, so stripping its DHT segments and splicing the defaults
    // back must reproduce the identical decode.
    val bi = new java.awt.image.BufferedImage(16, 16,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) {
      val g = (x * 16 + y * 5) % 256
      bi.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bo = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", bo))
    val full = bo.toByteArray
    // strip every DHT segment by marker walk
    val out = new java.io.ByteArrayOutputStream()
    out.write(full, 0, 2)
    var p = 2; var done = false
    while (!done) {
      val m = full(p + 1) & 0xff
      if (m == 0xda) { out.write(full, p, full.length - p); done = true }
      else {
        val len = ((full(p + 2) & 0xff) << 8) | (full(p + 3) & 0xff)
        if (m != 0xc4) out.write(full, p, 2 + len)
        p += 2 + len
      }
    }
    val stripped = out.toByteArray
    assert(stripped.length < full.length, "fixture JPEG carried no DHT")
    val a = Codecs.decodeMjpegFrame(stripped)
    val b = Codecs.decodeJpeg(full)
    assert(a.gray.sameElements(b.gray),
      "default-table decode must equal the tabled decode bit-for-bit")
  }

  test("sampleFrames: real AVI rows decode every stride-th frame " +
       "(one parse per video), stub path preserved for unknown bytes") {
    import spark.implicits._
    val docs = Seq((0L, "alpha beta gamma delta epsilon zeta"),
                   (1L, "x")).toDF("doc_id", "text")
    val media = Media.videosFromDocuments(docs, "doc_id", "text", nFrames = 6)
    val out = Media.sampleFrames(media, stride = 2, dim = 4).collect()
    assert(out.length == 2 * 3, "6 frames, stride 2 -> indices 0,2,4 per video")
    assert(out.map(_.getInt(1)).distinct.sorted.toSeq == Seq(0, 2, 4))
    // doc 0's frames drift (content shifts by 7 bytes/frame on a long
    // text) -> distinct features; doc 1 ("x", cycle length 1) is a
    // STATIC video -> identical features every frame
    val d0 = out.filter(_.getLong(0) == 0L).map(_.getSeq[Float](2)).toSeq
    assert(d0.distinct.size == d0.size, "drifting frames must differ")
    val d1 = out.filter(_.getLong(0) == 1L).map(_.getSeq[Float](2)).toSeq
    assert(d1.distinct.size == 1, "a static video's frames must be identical")
    // features are REAL decode output: frame 0 of doc 1 is constant
    // 'x' = 120 gray -> every pooled mean = 120/255
    d1.head.foreach(f => assert(math.abs(f - 120 / 255f) < 1e-3))
    // the stub path still fans out unknown containers by meta.n_frames
    val stub = Media.sampleFrames(Media.synthetic(spark, 6), stride = 4, dim = 4)
    assert(stub.count() == 2 * 3, "synthetic videos: n_frames=12, stride 4")
  }

  test("media_video_features: one row per document, deterministic; " +
       "motion is zero for static content and positive for drifting") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("media_video_features")(spark, sf)
      .collect().map(_.toString)
    val out = SparkEntry.queries("media_video_features")(spark, sf).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    assert(run().sameElements(run()), "video features must be deterministic")
    out.foreach { r =>
      assert(r.getLong(1) == 6, s"6 frames per video: $r")
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0, s"luma range: $r")
      assert(r.getDouble(3) >= 0.0, s"negative motion energy: $r")
    }
    assert(out.exists(_.getDouble(3) > 0.0), "no video carried any motion")
    // planted check: a single-char doc is a static video (cycle length 1)
    import spark.implicits._
    val planted = Seq((7L, "x"), (8L, "drifting words make moving frames"))
      .toDF("doc_id", "text")
    val media = Media.videosFromDocuments(planted, "doc_id", "text")
    val frames = Media.sampleFrames(media, stride = 1, dim = 8)
    val grouped = frames.withColumn("f", col("frame_features"))
      .collect().groupBy(_.getLong(0))
    val static = grouped(7L).map(_.getSeq[Float](2)).distinct
    assert(static.size == 1, "static video must have identical frames")
  }

  test("media_video_topk: retrieval over temporally-pooled frame " +
       "embeddings rides the ANN serve shard, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val run = () => SparkEntry.queries("media_video_topk")(spark, sf)
      .collect().map(_.toString)
    val out = SparkEntry.queries("media_video_topk")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 100)
    assert(run().sameElements(run()), "video retrieval must be deterministic")
    out.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), s"self-match: $r")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
  }

  test("media *IntStats oracle twins: decoded integer aggregates match " +
       "the generation rule computed WITHOUT the codecs (in-JVM mirror " +
       "of the DuckDB arithmetic oracle)") {
    import spark.implicits._
    // texts chosen to hit the edge cases the oracle must agree on:
    // multi-char cycle, single-char cycle, text shorter than the
    // 16-sample audio floor, and text that sanitizes to EMPTY
    val docs = Seq(
      (1L, "drifting words make moving frames"),
      (2L, "x"),
      (3L, "short"),
      (4L, "é世界\n\t")).toDF("doc_id", "text")
      .withColumn("text", regexp_replace(col("text"), "[^ -~]", ""))
    val bytes = docs.collect().map { r =>
      r.getLong(0) -> r.getString(1).getBytes("UTF-8")
    }.toMap
    def cyc(tb: Array[Byte], i: Int): Int =
      if (tb.isEmpty) 0 else tb(i % tb.length) & 0xff

    // image: 64x64 pixels, pixel(i) = byte(i mod len)
    val img = Media.imageIntStats(
      Media.imagesFromDocuments(docs, "doc_id", "text")).collect()
    assert(img.length == 4)
    img.foreach { r =>
      val tb = bytes(r.getLong(0))
      assert(r.getInt(1) == 4096, s"n_px: $r")
      val want = (0 until 4096).map(i => cyc(tb, i).toLong).sum
      assert(r.getLong(2) == want, s"image px_sum mismatch: $r want $want")
    }

    // audio: n = max(min(len, 2048), 16), sample = (byte - 128) * 256
    val au = Media.audioIntStats(
      Media.audioFromDocuments(docs, "doc_id", "text")).collect()
    assert(au.length == 4)
    au.foreach { r =>
      val tb = bytes(r.getLong(0))
      val n = math.max(math.min(tb.length, 2048), 16)
      assert(r.getInt(1) == n, s"n_samples: $r")
      val want = (0 until n).map(i => (cyc(tb, i) - 128L) * 256L).sum
      assert(r.getLong(2) == want, s"audio sample_sum mismatch: $r want $want")
    }

    // video: 6 frames of 16x12, pixel(i, fi) = byte((i + 7*fi) mod len)
    val vi = Media.videoIntStats(
      Media.videosFromDocuments(docs, "doc_id", "text")).collect()
    assert(vi.length == 4)
    vi.foreach { r =>
      val tb = bytes(r.getLong(0))
      def p(fi: Int, i: Int) = cyc(tb, i + 7 * fi)
      assert(r.getInt(1) == 6, s"n_frames: $r")
      val wantPx = (for (fi <- 0 until 6; i <- 0 until 192)
        yield p(fi, i).toLong).sum
      val wantMot = (for (fi <- 1 until 6; i <- 0 until 192)
        yield math.abs(p(fi, i) - p(fi - 1, i)).toLong).sum
      assert(r.getLong(2) == wantPx, s"video px_sum mismatch: $r want $wantPx")
      assert(r.getLong(3) == wantMot,
        s"video motion_l1 mismatch: $r want $wantMot")
    }
    // the static single-char video really has zero motion
    assert(vi.find(_.getLong(0) == 2L).get.getLong(3) == 0L)
  }

  test("media_video_int_stream: live codec round trip drains to the " +
       "batch twin row-for-row (same arithmetic oracle applies)") {
    val sf = "/root/testdata/sf0.001"
    val live = SparkEntry.queries("media_video_int_stream")(spark, sf)
      .collect().map(_.toString)
    val batch = SparkEntry.queries("media_video_int")(spark, sf)
      .collect().map(_.toString)
    assert(live.length == batch.length && live.sameElements(batch),
      "drained stream state must equal the batch twin")
  }

  // -- GIF (LZW, interlace, transparency, JDK cross-validation) ---------

  private def gifRecovered(img: Codecs.Image): Array[Int] =
    img.gray.map(g => math.round(g * 255f))

  test("GIF encode/decode round-trips pixels exactly through table " +
       "growth and a forced mid-stream table reset") {
    // > 12k pixels of low-repetition content pushes the LZW table
    // through every width (9..12 bits) and past 4096 entries, forcing
    // the encoder's clear/reset path; exact recovery proves the
    // variable-width bookkeeping on both sides.
    val w = 128; val h = 96
    var seed = 12345L
    val px = Array.tabulate[Byte](w * h) { _ =>
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) & 0xff).toByte
    }
    val anim = Codecs.decodeGif(Codecs.encodeGifGray(Seq(px), w, h))
    assert(anim.width == w && anim.height == h && anim.frames.length == 1)
    assert(gifRecovered(anim.frames(0)).sameElements(px.map(_ & 0xff)))
  }

  test("JDK ImageIO decodes our animated GIF to the same pixels " +
       "(independent decoder agrees with our LZW/width convention)") {
    val w = 32; val h = 24
    val frames = (0 until 3).map(fi =>
      Array.tabulate[Byte](w * h)(i => ((i * 7 + fi * 31) % 256).toByte))
    val bytes = Codecs.encodeGifGray(frames, w, h)
    val rdr = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    rdr.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(rdr.getNumImages(true) == 3)
    for (fi <- 0 until 3) {
      val bi = rdr.read(fi)
      assert(bi.getWidth == w && bi.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val want = frames(fi)(y * w + x) & 0xff
        val got = bi.getRGB(x, y) & 0xff // gray palette: B channel = index
        assert(got == want, s"frame $fi ($x,$y): jdk=$got ours=$want")
      }
    }
  }

  test("our decoder reads a JDK-encoded GIF byte-exactly " +
       "(the LZW convention pinned from the other direction)") {
    val w = 40; val h = 30
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 13 + y * 57) % 256
      bi.getRaster.setSample(x, y, 0, v)
    }
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", baos))
    val anim = Codecs.decodeGif(baos.toByteArray)
    assert(anim.width == w && anim.height == h)
    val rec = gifRecovered(anim.frames(0))
    // JDK writes TYPE_BYTE_GRAY through a gray palette; its palette
    // entry for index i is (i,i,i), so recovery is exact.
    for (y <- 0 until h; x <- 0 until w)
      assert(rec(y * w + x) == (x * 13 + y * 57) % 256, s"($x,$y)")
  }

  test("interlaced GIF rows land in appendix-E pass order") {
    // 4x8 image, row y constant at 10*y; store rows in interlace order
    // (0,4,2,6,1,3,5,7 for h=8) and set the interlace flag — the
    // decoder must un-permute back to 0..7.
    val w = 4; val h = 8
    val storageRows = Array(0, 4, 2, 6, 1, 3, 5, 7)
    val px = storageRows.flatMap(y => Array.fill(w)((10 * y).toByte))
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h); out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(0x40) // interlace flag, no local table
    out.write(8)
    val lzw = Codecs.lzwEncode(px, 8)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n); out.write(lzw, o, n); o += n
    }
    out.write(0); out.write(0x3b)
    val anim = Codecs.decodeGif(out.toByteArray)
    val rec = gifRecovered(anim.frames(0))
    for (y <- 0 until h; x <- 0 until w)
      assert(rec(y * w + x) == 10 * y, s"row $y col $x: ${rec(y * w + x)}")
  }

  test("transparent pixels keep the prior canvas (GIF89a compositing)") {
    // frame 1: all 100. frame 2: left half 200, right half transparent
    // (index 7) — the composited second canvas is 200|100.
    val w = 4; val h = 2
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def frame(px: Array[Byte], gceTransparent: Int): Unit = {
      if (gceTransparent >= 0) {
        out.write(0x21); out.write(0xf9); out.write(4)
        out.write(0x04 | 1); le16(0); out.write(gceTransparent); out.write(0)
      }
      out.write(0x2c); le16(0); le16(0); le16(w); le16(h); out.write(0)
      out.write(8)
      val lzw = Codecs.lzwEncode(px, 8)
      var o = 0
      while (o < lzw.length) {
        val n = math.min(255, lzw.length - o)
        out.write(n); out.write(lzw, o, n); o += n
      }
      out.write(0)
    }
    out.write("GIF89a".getBytes("US-ASCII"))
    le16(w); le16(h); out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    frame(Array.fill[Byte](w * h)(100), -1)
    frame(Array.tabulate[Byte](w * h)(i => if (i % w < w / 2) 200.toByte else 7), 7)
    out.write(0x3b)
    val anim = Codecs.decodeGif(out.toByteArray)
    assert(anim.frames.length == 2)
    val f2 = gifRecovered(anim.frames(1))
    for (y <- 0 until h; x <- 0 until w)
      assert(f2(y * w + x) == (if (x < w / 2) 200 else 100), s"($x,$y)")
  }

  test("malformed GIF blobs degrade to the stub, never abort the job " +
       "(the module contract fuzzed)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // valid magic + garbage tails of every small length, including a
    // truncated-mid-color-table and a runaway-extension shape
    val blobs = (0 until 64).map { i =>
      "GIF89a".getBytes("US-ASCII") ++ Array.fill[Byte](i)(rnd.nextInt().toByte)
    }
    blobs.foreach { b =>
      // decodeGif itself must throw something catchable, not hang
      intercept[Exception](Codecs.decodeGif(b))
      // ... and the Media plumbing must fall back to the stub
      val f = Media.realDecode(b, 8)
      assert(f.length == 8)
    }
    // through the DataFrame path too: video rows with junk bytes
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, "video", b) }
      .toDF("media_id", "kind", "bytes")
      .withColumn("meta", struct(lit(4).as("width"), lit(4).as("height"),
        lit(0).as("sample_rate"), lit(2).as("n_frames")))
    val out = Media.sampleFrames(df, stride = 1)
    assert(out.count() == 64 * 2) // stub path: meta-declared frame count
  }

  test("the video container is feature-neutral: AVI and GIF rows with " +
       "identical frames yield identical int stats and features") {
    import spark.implicits._
    // ids 0 (AVI) and 1 (GIF) share the text -> same frames
    val docs = Seq((0L, "containers must not matter"),
                   (1L, "containers must not matter")).toDF("doc_id", "text")
    val media = Media.videosFromDocuments(docs, "doc_id", "text").cache()
    val kinds = media.collect().map(r =>
      r.getLong(0) -> Codecs.detect(r.getAs[Array[Byte]](2))).toMap
    assert(kinds(0L) == Codecs.Avi && kinds(1L) == Codecs.Gif)
    val stats = Media.videoIntStats(media).collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stats(0L) == stats(1L), s"int stats diverge: $stats")
    val feats = Media.decodeFeatures(media, dim = 16).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](r.length - 1))).toMap
    assert(feats(0L) == feats(1L), "first-frame features diverge")
    val fr = Media.sampleFrames(media, stride = 2).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getSeq[Float](2)))
      .groupBy(_._1._1).view
      .mapValues(_.sortBy(_._1._2).map(_._2).toSeq).toMap
    assert(fr(0L) == fr(1L), "sampled frame features diverge")
  }
}
