package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Dependency-free real codecs for the formats parseable in plain
  * JVM code: PNG (zlib inflate is `java.util.zip`; the filter
  * algebra including Paeth is the spec), Netpbm images (binary P5
  * grayscale / P6 RGB) and PCM WAV audio (RIFF/WAVE, 16-bit
  * little-endian). These replace the `Media.fakeDecode` stub for
  * recognized containers; unrecognized bytes (JPEG-class lossy
  * formats, video) still fall through to the stub (documented) so the
  * plumbing accepts any blob.
  *
  * Format references are the public specs: the PNG specification
  * (W3C/ISO 15948 — chunk layout §5, filters §9, zlib datastream
  * §10), Netpbm pgm(5)/ppm(5), and the Microsoft/IBM RIFF WAVE
  * format (fmt chunk 16, PCM).
  */
object Codecs {

  /** A decoded image: gray pixels in [0,1], row-major. P6 RGB reduces
    * to luminance with the Rec.601 weights. */
  final case class Image(width: Int, height: Int, gray: Array[Float])

  /** A decoded audio clip: samples in [-1,1). */
  final case class Audio(sampleRate: Int, samples: Array[Float])

  sealed trait Kind
  case object Pgm extends Kind
  case object Ppm extends Kind
  case object Wav extends Kind
  case object Png extends Kind
  case object Unknown extends Kind

  private val PngSig: Array[Int] = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  def detect(bytes: Array[Byte]): Kind =
    if (bytes.length >= 8 &&
        (0 until 8).forall(i => (bytes(i) & 0xff) == PngSig(i))) Png
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5') Pgm
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Ppm
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
             bytes(2) == 'F' && bytes(3) == 'F' &&
             bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
             bytes(11) == 'E') Wav
    else Unknown

  // -- Netpbm (P5 gray / P6 RGB, binary, maxval <= 255) ----------------

  /** Parse the Netpbm header: magic, then whitespace/comment-separated
    * width, height, maxval, then ONE whitespace byte before the raster. */
  private def pnmHeader(b: Array[Byte]): (Int, Int, Int, Int) = {
    var i = 2 // past magic
    def skipWs(): Unit = {
      var go = true
      while (go && i < b.length) {
        val c = b(i).toChar
        if (c == '#') { while (i < b.length && b(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      var v = 0
      require(i < b.length && b(i).toChar.isDigit, s"bad pnm header at byte $i")
      while (i < b.length && b(i).toChar.isDigit) { v = v * 10 + (b(i) - '0'); i += 1 }
      v
    }
    val w = int(); val h = int(); val maxval = int()
    require(i < b.length && b(i).toChar.isWhitespace, "missing raster separator")
    i += 1
    require(w > 0 && h > 0 && maxval > 0 && maxval <= 255,
      s"unsupported pnm: ${w}x$h maxval=$maxval")
    (w, h, maxval, i)
  }

  def decodePgm(bytes: Array[Byte]): Image = {
    require(detect(bytes) == Pgm, "not a P5 pgm")
    val (w, h, maxval, off) = pnmHeader(bytes)
    require(bytes.length >= off + w * h, s"truncated pgm raster: ${bytes.length} < ${off + w * h}")
    val gray = new Array[Float](w * h)
    var i = 0
    while (i < w * h) { gray(i) = (bytes(off + i) & 0xff).toFloat / maxval; i += 1 }
    Image(w, h, gray)
  }

  def decodePpm(bytes: Array[Byte]): Image = {
    require(detect(bytes) == Ppm, "not a P6 ppm")
    val (w, h, maxval, off) = pnmHeader(bytes)
    require(bytes.length >= off + 3 * w * h, "truncated ppm raster")
    val gray = new Array[Float](w * h)
    var i = 0
    while (i < w * h) {
      val r = bytes(off + 3 * i) & 0xff
      val g = bytes(off + 3 * i + 1) & 0xff
      val b = bytes(off + 3 * i + 2) & 0xff
      gray(i) = (0.299f * r + 0.587f * g + 0.114f * b) / maxval
      i += 1
    }
    Image(w, h, gray)
  }

  /** Encode 8-bit gray pixels as binary P5. */
  def encodePgm(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val header = s"P5\n$w $h\n255\n".getBytes(StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  /** Nearest-neighbour resample to (w2, h2), re-encoded as P5 — the
    * real implementation behind `Media.resize` for image rows. */
  def resizePgm(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val img = decodePgm(bytes)
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        out(y * w2 + x) = math.round(img.gray(sy * img.width + sx) * 255f).toByte
        x += 1
      }
      y += 1
    }
    encodePgm(out, w2, h2)
  }

  // -- PNG (8-bit, non-interlaced; gray/RGB/gray+A/RGBA) ----------------

  /** Decode a PNG to gray pixels in [0,1]. Supported: bit depth 8,
    * color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    * interlace 0 — the overwhelmingly common byte layouts; palette
    * (3) and sub-byte depths are rejected loudly. The zlib IDAT
    * stream inflates through `java.util.zip.Inflater`; every chunk
    * CRC is verified (a truncated or bit-flipped file fails here, not
    * as garbage pixels); all five filter types (None/Sub/Up/Average/
    * Paeth) are reconstructed per the spec's byte algebra. Color
    * reduces to luminance with the same Rec.601 weights as `decodePpm`;
    * alpha is ignored (feature pooling reads opaque content). */
  def decodePng(bytes: Array[Byte]): Image = {
    require(detect(bytes) == Png, "not a PNG")
    val crc = new java.util.zip.CRC32
    var pos = 8
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false; var seenIend = false
    val idat = new java.io.ByteArrayOutputStream()
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    while (!seenIend) {
      require(pos + 8 <= bytes.length, "truncated png (chunk header)")
      val len = be32(pos)
      require(len >= 0 && pos + 12 + len <= bytes.length, s"bad chunk length $len")
      val typ = new String(bytes, pos + 4, 4, StandardCharsets.US_ASCII)
      crc.reset(); crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == be32(pos + 8 + len), s"CRC mismatch in $typ")
      typ match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          w = be32(pos + 8); h = be32(pos + 12)
          val bitDepth = bytes(pos + 16) & 0xff
          val colorType = bytes(pos + 17) & 0xff
          val interlace = bytes(pos + 20) & 0xff
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(bitDepth == 8, s"only 8-bit PNG supported, got depth $bitDepth")
          require(interlace == 0, "interlaced (Adam7) PNG not supported")
          channels = colorType match {
            case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
            case t => throw new IllegalArgumentException(
              s"unsupported PNG color type $t (palette needs PLTE handling)")
          }
          seenIhdr = true
        case "IDAT" =>
          require(seenIhdr, "IDAT before IHDR")
          idat.write(bytes, pos + 8, len)
        case "IEND" => seenIend = true
        case _ => () // ancillary chunk — CRC-checked above, content ignored
      }
      pos += 12 + len
    }
    require(seenIhdr && idat.size() > 0, "missing IHDR or IDAT")
    // inflate the zlib stream to exactly h rows of (1 filter byte + stride)
    val stride = w * channels
    val raw = new Array[Byte]((stride + 1) * h)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val n = inf.inflate(raw, got, raw.length - got)
      require(n > 0 || inf.finished(),
        "truncated or non-advancing zlib stream in IDAT")
      got += n
    }
    inf.end()
    require(got == raw.length, s"inflated $got bytes, want ${raw.length}")
    // per-row unfilter (spec §9): a = left, b = up, c = up-left, per byte
    val recon = new Array[Int](stride * h)
    val bpp = channels
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(y * (stride + 1) + 1 + i) & 0xff
        val a = if (i >= bpp) recon(y * stride + i - bpp) else 0
        val b = if (y > 0) recon((y - 1) * stride + i) else 0
        val c = if (y > 0 && i >= bpp) recon((y - 1) * stride + i - bpp) else 0
        val v = f match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
            x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
          case other => throw new IllegalArgumentException(s"bad filter type $other row $y")
        }
        recon(y * stride + i) = v & 0xff
        i += 1
      }
      y += 1
    }
    // gray reduction per color type
    val gray = new Array[Float](w * h)
    var p = 0
    while (p < w * h) {
      val o = p * channels
      gray(p) = channels match {
        case 1 | 2 => recon(o) / 255f
        case _ =>
          (0.299f * recon(o) + 0.587f * recon(o + 1) + 0.114f * recon(o + 2)) / 255f
      }
      p += 1
    }
    Image(w, h, gray)
  }

  /** Encode 8-bit gray pixels as a minimal standard PNG (color type 0,
    * filter 0 rows, one zlib IDAT, CRC'd chunks) — decodable by any
    * compliant reader. */
  def encodePngGray(pixels: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      raw(y * (w + 1)) = 0 // filter: None
      System.arraycopy(pixels, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) out.write(buf, 0, defl.deflate(buf))
    defl.end()
    val zdata = out.toByteArray
    val bb = ByteBuffer.allocate(8 + 25 + (12 + zdata.length) + 12)
    PngSig.foreach(s => bb.put(s.toByte))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      bb.putInt(data.length)
      val t = typ.getBytes(StandardCharsets.US_ASCII)
      bb.put(t).put(data)
      val crc = new java.util.zip.CRC32
      crc.update(t); crc.update(data)
      bb.putInt(crc.getValue.toInt)
    }
    val ihdr = ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    chunk("IDAT", zdata)
    chunk("IEND", Array.emptyByteArray)
    bb.array()
  }

  /** Nearest-neighbour resample of any supported PNG to (w2, h2),
    * re-encoded as gray PNG — `Media.resize` for PNG rows (color
    * inputs resample their luminance plane, the feature the pipeline
    * reads). */
  def resizePng(bytes: Array[Byte], w2: Int, h2: Int): Array[Byte] = {
    val img = decodePng(bytes)
    val out = new Array[Byte](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = y * img.height / h2
      var x = 0
      while (x < w2) {
        val sx = x * img.width / w2
        out(y * w2 + x) = math.round(img.gray(sy * img.width + sx) * 255f).toByte
        x += 1
      }
      y += 1
    }
    encodePngGray(out, w2, h2)
  }

  // -- PCM WAV (RIFF/WAVE, fmt chunk, 16-bit LE) -----------------------

  def decodeWav(bytes: Array[Byte]): Audio = {
    require(detect(bytes) == Wav, "not a RIFF/WAVE file")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    var pos = 12 // past RIFF size WAVE
    var sampleRate = 0; var bitsPerSample = 0; var channels = 0
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
      val id = new String(bytes, pos, 4, StandardCharsets.US_ASCII)
      val sz = bb.getInt(pos + 4)
      require(sz >= 0 && pos + 8 + sz <= bytes.length, s"bad chunk $id size $sz")
      if (id == "fmt ") {
        val fmt = bb.getShort(pos + 8) & 0xffff
        require(fmt == 1, s"not PCM (fmt tag $fmt)")
        channels = bb.getShort(pos + 10) & 0xffff
        sampleRate = bb.getInt(pos + 12)
        bitsPerSample = bb.getShort(pos + 22) & 0xffff
        require(bitsPerSample == 16, s"only 16-bit PCM supported, got $bitsPerSample")
        require(channels >= 1, "zero channels")
      } else if (id == "data") { dataOff = pos + 8; dataLen = sz }
      pos += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt or data chunk")
    val n = dataLen / 2 / channels
    val samples = new Array[Float](n)
    var i = 0
    while (i < n) {
      // multi-channel mixes down to the first channel (deterministic)
      samples(i) = bb.getShort(dataOff + i * 2 * channels).toFloat / 32768f
      i += 1
    }
    Audio(sampleRate, samples)
  }

  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
    bb.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    bb.put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(sampleRate).putInt(sampleRate * 2) // byte rate
    bb.putShort(2).putShort(16) // block align, bits
    bb.put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }
}
