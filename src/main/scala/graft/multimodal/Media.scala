package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed by per-partition batch
  * operators (the Scala analogue of `mapInPandas` — one expensive
  * "codec" init per partition, then iterator-streamed rows, constant
  * memory).
  *
  * Byte decoding is REAL for the dependency-free formats `Codecs`
  * parses — PNG, baseline JPEG, Netpbm P5/P6 images, 16-bit PCM WAV
  * audio and AVI video (uncompressed DIB + MJPEG frames): recognized
  * containers decode to genuine pixels/samples/frames and pool to
  * features. Anything else (MP3, MP4-class video — no codec libs in
  * this container) falls through to the clearly-marked `fakeDecode`
  * STUB, which derives deterministic pseudo-features from the byte
  * content; the call sites are identical, so binding a real codec
  * library later changes only the dispatch table.
  */
object Media {

  /** Canonical media table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType), StructField("height", IntegerType),
      StructField("sample_rate", IntegerType), StructField("n_frames", IntegerType))))))

  /** Decode recognized containers for real; everything else hits the
    * stub. Images pool decoded gray pixels to `dim` block means; audio
    * pools decoded samples to `dim` block RMS energies — both are
    * genuine content-derived features (a brighter image region or a
    * louder audio span moves its feature), the standard cheap baseline
    * before a learned encoder. */
  def realDecode(bytes: Array[Byte], dim: Int): Array[Float] =
    Codecs.detect(bytes) match {
      case Codecs.Png  => poolMean(Codecs.decodePng(bytes).gray, dim)
      case Codecs.Jpeg => poolMean(Codecs.decodeJpeg(bytes).gray, dim)
      case Codecs.Pgm  => poolMean(Codecs.decodePgm(bytes).gray, dim)
      case Codecs.Ppm  => poolMean(Codecs.decodePpm(bytes).gray, dim)
      case Codecs.Wav  => poolRms(Codecs.decodeWav(bytes).samples, dim)
      case Codecs.Avi | Codecs.Gif =>
        // video thumbnail embedding: first decoded frame's luma plane.
        // A blob can carry the container magic yet fail the walk
        // (truncated chunk, missing strh/strf, zero frames) — one
        // such row must degrade to the stub, not abort a 100 TB job,
        // per the module contract "the plumbing accepts any blob".
        parseAnimation(bytes) match {
          case Some((_, frame)) => poolMean(frame(0).gray, dim)
          case None             => fakeDecode(bytes, dim)
        }
      case Codecs.Unknown => fakeDecode(bytes, dim)
    }

  /** ONE container parse per video blob, unified across the two real
    * animation containers (RIFF/AVI and GIF): the frame count plus a
    * per-frame decoder closing over the parsed container — the
    * parse-once-decode-many shape every frame consumer shares. None
    * when the magic matches but the walk fails (malformed blob → the
    * caller's stub path). */
  private def parseAnimation(b: Array[Byte]): Option[(Int, Int => Codecs.Image)] =
    Codecs.detect(b) match {
      case Codecs.Avi => scala.util.Try {
        val v = Codecs.parseAvi(b)
        require(v.frames.nonEmpty, "AVI with zero frames")
        (v.frames.length, (i: Int) => Codecs.decodeVideoFrame(v, i))
      }.toOption
      case Codecs.Gif => scala.util.Try {
        val g = Codecs.decodeGif(b)
        require(g.frames.nonEmpty, "GIF with zero frames")
        (g.frames.length, (i: Int) => g.frames(i))
      }.toOption
      case _ => None
    }

  /** Mean over `dim` contiguous equal blocks (image pooling). */
  private[multimodal] def poolMean(xs: Array[Float], dim: Int): Array[Float] =
    pool(xs, dim)(seg => seg.sum / seg.length)

  /** RMS over `dim` contiguous equal blocks (audio energy envelope). */
  private[multimodal] def poolRms(xs: Array[Float], dim: Int): Array[Float] =
    pool(xs, dim)(seg => math.sqrt(seg.map(x => x * x).sum / seg.length).toFloat)

  private def pool(xs: Array[Float], dim: Int)(f: Array[Float] => Float): Array[Float] = {
    require(xs.nonEmpty, "empty decoded payload")
    Array.tabulate(dim) { i =>
      val lo = math.min(i * xs.length / dim, xs.length - 1)
      val hi = math.max(math.min((i + 1) * xs.length / dim, xs.length), lo + 1)
      f(java.util.Arrays.copyOfRange(xs, lo, hi))
    }
  }

  /** STUB — stands in for codecs this container lacks (MP3, MP4-class
    * video …). Deterministic FNV-1a-seeded pseudo-features so tests can
    * assert shape + determinism. Replace the body with a real decoder
    * binding to productionize; the call sites don't change. */
  def fakeDecode(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) {
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL; h ^= h >>> 33
      out(j) = ((h & 0xffffffL).toFloat / 0xffffffL.toFloat) * 2f - 1f
      j += 1
    }
    out
  }

  /** Per-partition batched decode: binary → feature vector. The codec
    * handle is created once per partition (the expensive-init pattern
    * that motivates mapPartitions over a per-row UDF), rows stream
    * through an iterator — no partition-wide materialization. */
  def decodeFeatures(df: DataFrame, dim: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "bytes") :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(outSchema)
    val bytesIdx = df.schema.fieldIndex("bytes")
    val keepIdx = df.schema.fields.zipWithIndex.collect {
      case (f, i) if f.name != "bytes" => i
    }
    df.mapPartitions { rows =>
      // [codec-library init would happen here, once per partition]
      rows.map { r =>
        // null bytes (possible on rows from external sources) → null
        // features, not an NPE inside Codecs.detect
        val feats =
          if (r.isNullAt(bytesIdx)) null
          else realDecode(r.getAs[Array[Byte]](bytesIdx), dim).toSeq
        Row.fromSeq(keepIdx.map(r.get).toSeq :+ feats)
      }
    }(enc)
  }

  /** Resize: REAL nearest-neighbour resample + P5 re-encode for
    * recognized image bytes (`Codecs.resizePgm`); other containers
    * pass bytes through with the metadata rewritten — the schema/
    * metadata contract downstream operators depend on is identical
    * either way. */
  def resize(df: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = Encoders.row(df.schema)
    val bytesIdx = df.schema.fieldIndex("bytes")
    val metaIdx = df.schema.fieldIndex("meta")
    df.mapPartitions { rows =>
      rows.map { r =>
        // meta is nullable in mediaSchema and bytes may be null on rows
        // from external sources — pass nulls through rather than NPE;
        // the rewritten meta still records the requested target size.
        val b = if (r.isNullAt(bytesIdx)) null else r.getAs[Array[Byte]](bytesIdx)
        val m = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
        val b2 =
          if (b == null) null
          else Codecs.detect(b) match {
            case Codecs.Pgm  => Codecs.resizePgm(b, w, h)
            case Codecs.Png  => Codecs.resizePng(b, w, h)
            case Codecs.Jpeg => Codecs.resizeJpeg(b, w, h)
            case _           => b
          }
        val sr = if (m == null) null else m.get(2)
        val nf = if (m == null) null else m.get(3)
        Row.fromSeq(r.toSeq.updated(bytesIdx, b2)
          .updated(metaIdx, Row(w, h, sr, nf)))
      }
    }(enc)
  }

  /** Frame sampling for video rows: every `stride`-th frame decoded to
    * a feature vector → one row per sampled frame. For recognized AVI
    * containers the decode is REAL: the container is parsed ONCE per
    * video (not once per frame — the scale-relevant shape: one codec
    * init amortized over the frame fan-out), each sampled frame's
    * DIB/MJPEG payload decodes to its luma plane and pools to block
    * means. Unrecognized containers — and recognized-but-malformed
    * ones whose container walk fails — keep the documented stub path
    * (meta-declared frame count, frame index salting the deterministic
    * pseudo-decode) so the plumbing still accepts any blob. */
  def sampleFrames(df: DataFrame, stride: Int, dim: Int = 16): DataFrame = {
    require(stride >= 1, s"stride $stride")
    val vids = df.filter(col("kind") === "video")
      .select(col("media_id"), col("bytes"), col("meta.n_frames").as("__nf"))
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType), StructField("frame_idx", IntegerType),
      StructField("frame_features", ArrayType(FloatType, containsNull = false)))))
    vids.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val b = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        // None when the magic says AVI/GIF but the container walk
        // fails (truncated chunk, missing headers) — that row falls
        // through to the stub path below instead of aborting the job.
        val parsed =
          if (b != null) parseAnimation(b) // one parse per video row
          else None
        if (parsed.isDefined) {
          val (nFrames, frame) = parsed.get
          (0 until nFrames by stride).iterator.map { i =>
            Row(id, i, poolMean(frame(i).gray, dim).toSeq)
          }
        } else {
          val nf = if (r.isNullAt(2)) 0 else r.getInt(2)
          (0 until nf by stride).iterator.map { i =>
            val base = if (b == null) Array.emptyByteArray else b
            val salted = base :+ (i & 0xff).toByte :+ ((i >> 8) & 0xff).toByte
            Row(id, i, fakeDecode(salted, dim).toSeq)
          }
        }
      }
    }(enc)
  }

  /** Documents → media table with REAL containers: text bytes become
    * genuine image rasters (doc_id % 3 == 0 — standard PNG with a
    * zlib IDAT for doc_id % 6 == 0, binary P5 for % 6 == 3; SAME
    * pixels either way, so the container choice is provably
    * feature-neutral), genuine 16-bit PCM WAV clips (== 1), or
    * genuine uncompressed-DIB AVI videos (== 2 — bottom-up BGR24
    * frames whose content drifts with the frame index, so motion is
    * real). The downstream pipeline then exercises the real
    * parse/decode path end to end on ALL THREE modalities. */
  def fromDocuments(docs: DataFrame, idCol: String, textCol: String,
                    imgW: Int = 64, imgH: Int = 48,
                    sampleRate: Int = 16000, maxSamples: Int = 2048): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("media_id"),
      coalesce(col(textCol), lit("")).as("__text"))
    val enc = Encoders.row(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val tb = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def cyc(i: Int): Byte = if (tb.isEmpty) 0 else tb(i % tb.length)
        (id % 3) match {
          case 0 =>
            val px = Array.tabulate[Byte](imgW * imgH)(cyc)
            val container =
              if (id % 6 == 0) Codecs.encodePngGray(px, imgW, imgH)
              else Codecs.encodePgm(px, imgW, imgH)
            Row(id, "image", container, Row(imgW, imgH, 0, 0))
          case 1 =>
            val n = math.max(math.min(tb.length, maxSamples), 16)
            val samples = Array.tabulate[Short](n)(i => (((cyc(i) & 0xff) - 128) << 8).toShort)
            Row(id, "audio", Codecs.encodeWav(samples, sampleRate),
                Row(0, 0, sampleRate, 0))
          case _ =>
            val nFrames =
              math.max(2, math.min(r.getString(1).trim.split("\\s+").length, 12))
            val (vw, vh) = (16, 12)
            val frames = (0 until nFrames).map { fi =>
              Array.tabulate[Byte](vw * vh)(i => cyc(i + 7 * fi))
            }
            // same container split as videosFromDocuments: DIB-AVI for
            // id % 6 == 2, grayscale GIF for % 6 == 5 — SAME pixels, so
            // the container is provably feature-neutral (the PNG-vs-P5
            // image rule applied to the video arm)
            val container =
              if (id % 6 == 2) Codecs.encodeAviDib(frames, vw, vh)
              else Codecs.encodeGifGray(frames, vw, vh)
            Row(id, "video", container, Row(vw, vh, 0, nFrames))
        }
      }
    }(enc)
  }

  /** Per-partition WAV decode for AUDIO rows: binary → the raw sample
    * array (`array<double>`, first channel, [-1, 1)) plus the parsed
    * sample rate — the input shape the native frame-analysis
    * expressions (`functions.FrameEnergy` / `functions.SpectralFlux`)
    * operate on. Non-audio rows are filtered out here (kind
    * dispatch), unknown containers fail LOUDLY inside `decodeWav` —
    * an audio row that doesn't parse is corrupt input, not a stub
    * case. Same iterator-streamed `mapPartitions` posture as
    * `decodeFeatures`. */
  def decodeAudio(df: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = false),
      StructField("samples", ArrayType(DoubleType, containsNull = false))))
    val enc = Encoders.row(outSchema)
    val in = df.filter(col("kind") === "audio").select("media_id", "bytes")
    in.mapPartitions { rows =>
      rows.map { r =>
        val audio = Codecs.decodeWav(r.getAs[Array[Byte]](1))
        Row(r.getLong(0), audio.sampleRate,
            audio.samples.map(_.toDouble).toSeq)
      }
    }(enc)
  }

  /** Integer byte-recovery stats — the media ORACLE-TWIN primitive.
    * Every lossless decoder here bottoms out in values that recover
    * the SOURCE bytes exactly: P5/PNG gray and DIB luma round-trip
    * through `round(gray*255)` (worst-case float error ~1e-4, far
    * below the 0.5 rounding threshold), and 16-bit PCM samples are
    * `short/32768f` — exactly representable in float, so
    * `round(s*32768)` is the identity. Per-row INTEGER aggregates
    * over decoded payloads are therefore deterministic and replicable
    * by an arithmetic oracle (DuckDB SQL over the same text source)
    * that never touches the container bytes — proving the
    * encode → parse → decode round trip end to end. The sums are
    * flip-invariant (pixel ORDER doesn't change a sum, and motion
    * pairs pixels at the SAME index across frames, preserved under
    * the uniform bottom-up DIB flip). JPEG is deliberately rejected:
    * lossy decode has no byte-exact recovery. */
  def imageIntStats(df: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_px", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false))))
    df.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val b = r.getAs[Array[Byte]](1)
          val img = Codecs.detect(b) match {
            case Codecs.Png => Codecs.decodePng(b)
            case Codecs.Pgm => Codecs.decodePgm(b)
            case Codecs.Ppm => Codecs.decodePpm(b)
            case other => throw new IllegalArgumentException(
              s"imageIntStats: lossless image container required, got $other")
          }
          var s = 0L; var i = 0
          while (i < img.gray.length) {
            s += math.round(img.gray(i) * 255f).toLong; i += 1
          }
          Row(r.getLong(0), img.gray.length, s)
        }
      }(enc)
  }

  /** 16-bit PCM recovery twin stats: exact sample count + integer
    * sample sum (see `imageIntStats` for the recovery argument). */
  def audioIntStats(df: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_samples", IntegerType, nullable = false),
      StructField("sample_sum", LongType, nullable = false))))
    df.filter(col("kind") === "audio").select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val a = Codecs.decodeWav(r.getAs[Array[Byte]](1))
          var s = 0L; var i = 0
          while (i < a.samples.length) {
            s += math.round(a.samples(i) * 32768f).toLong; i += 1
          }
          Row(r.getLong(0), a.samples.length, s)
        }
      }(enc)
  }

  /** DIB-AVI recovery twin stats: frame count, total recovered-luma
    * sum, and integer L1 motion between consecutive frames (pixels
    * paired at the same index — flip-invariant; see `imageIntStats`
    * for the recovery argument). One container parse per video. */
  def videoIntStats(df: DataFrame): DataFrame = {
    val enc = Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_frames", IntegerType, nullable = false),
      StructField("px_sum", LongType, nullable = false),
      StructField("motion_l1", LongType, nullable = false))))
    df.filter(col("kind") === "video").select("media_id", "bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val b = r.getAs[Array[Byte]](1)
          val (nFrames, frame): (Int, Int => Codecs.Image) =
            Codecs.detect(b) match {
              case Codecs.Avi =>
                val v = Codecs.parseAvi(b)
                require(v.compression == 0,
                  "videoIntStats: uncompressed DIB required (lossless recovery)")
                (v.frames.length, (i: Int) => Codecs.decodeVideoFrame(v, i))
              case Codecs.Gif =>
                // grayscale-palette GIF recovers bytes exactly through
                // the SAME Rec.601 float algebra as DIB (index i maps
                // to (i,i,i)) — the second lossless video container
                // under the one arithmetic oracle.
                val g = Codecs.decodeGif(b)
                (g.frames.length, (i: Int) => g.frames(i))
              case other => throw new IllegalArgumentException(
                s"videoIntStats: lossless video container required, got $other")
            }
          var px = 0L; var mot = 0L
          var prev: Array[Int] = null
          var fi = 0
          while (fi < nFrames) {
            val g = frame(fi).gray
            val cur = new Array[Int](g.length)
            var i = 0
            while (i < g.length) {
              val b8 = math.round(g(i) * 255f)
              cur(i) = b8; px += b8
              if (prev != null) mot += math.abs(b8 - prev(i))
              i += 1
            }
            prev = cur; fi += 1
          }
          Row(r.getLong(0), nFrames, px, mot)
        }
      }(enc)
  }

  /** Every document as a genuine 16-bit PCM WAV clip (retrieval-query
    * shape: one modality, whole corpus) — the audio analogue of
    * `imagesFromDocuments`, same deterministic text-byte-derived
    * samples as the `id % 3 == 1` arm of `fromDocuments`. */
  def audioFromDocuments(docs: DataFrame, idCol: String, textCol: String,
                         sampleRate: Int = 16000, maxSamples: Int = 2048): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("media_id"),
      coalesce(col(textCol), lit("")).as("__text"))
    val enc = Encoders.row(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val tb = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def cyc(i: Int): Byte = if (tb.isEmpty) 0 else tb(i % tb.length)
        val n = math.max(math.min(tb.length, maxSamples), 16)
        val samples = Array.tabulate[Short](n)(i => (((cyc(i) & 0xff) - 128) << 8).toShort)
        Row(r.getLong(0), "audio", Codecs.encodeWav(samples, sampleRate),
            Row(0, 0, sampleRate, 0))
      }
    }(enc)
  }

  /** Every document as a genuine video (retrieval-query shape: one
    * modality, whole corpus) — the video analogue of
    * `audioFromDocuments`. Frame content drifts with the frame index
    * (same byte-cycle rule as the `id % 3 == 2` arm of
    * `fromDocuments`), so per-frame features differ and motion
    * analysis has real signal. TWO real containers carry the SAME
    * frames — uncompressed-DIB AVI for even ids, LZW-compressed
    * grayscale-palette GIF for odd — so every downstream consumer
    * (features, serve, the `media_video_int` arithmetic oracle, whose
    * expected sums depend on the text alone) proves the container
    * choice feature-neutral for video exactly as PNG-vs-P5 does for
    * images: a decode divergence in EITHER codec breaks the hash. */
  def videosFromDocuments(docs: DataFrame, idCol: String, textCol: String,
                          w: Int = 16, h: Int = 12, nFrames: Int = 6): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("media_id"),
      coalesce(col(textCol), lit("")).as("__text"))
    val enc = Encoders.row(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val tb = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def cyc(i: Int): Byte = if (tb.isEmpty) 0 else tb(i % tb.length)
        val frames = (0 until nFrames).map { fi =>
          Array.tabulate[Byte](w * h)(i => cyc(i + 7 * fi))
        }
        val container =
          if (id % 2 == 0) Codecs.encodeAviDib(frames, w, h)
          else Codecs.encodeGifGray(frames, w, h)
        Row(id, "video", container, Row(w, h, 0, nFrames))
      }
    }(enc)
  }

  /** Every document as a genuine P5 image (retrieval-query shape:
    * one modality, whole corpus). */
  def imagesFromDocuments(docs: DataFrame, idCol: String, textCol: String,
                          w: Int = 64, h: Int = 64): DataFrame = {
    val in = docs.select(col(idCol).cast("long").as("media_id"),
      coalesce(col(textCol), lit("")).as("__text"))
    val enc = Encoders.row(mediaSchema)
    in.mapPartitions { rows =>
      rows.map { r =>
        val tb = r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val px = Array.tabulate[Byte](w * h)(i => if (tb.isEmpty) 0 else tb(i % tb.length))
        Row(r.getLong(0), "image", Codecs.encodePgm(px, w, h), Row(w, h, 0, 0))
      }
    }(enc)
  }

  /** Deterministic synthetic media table (tests / demos). */
  def synthetic(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + i % 32)(j => ((i * 31 + j) % 251).toByte)
      Row(i.toLong, kind, bytes, Row(64, 48, 16000, if (kind == "video") 12 else 0))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
