package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Dependency-free real codecs for the two formats parseable in plain
  * JVM code: Netpbm images (binary P5 grayscale / P6 RGB) and PCM WAV
  * audio (RIFF/WAVE, 16-bit little-endian). These replace the
  * `Media.fakeDecode` stub for recognized containers; unrecognized
  * bytes still fall through to the stub (documented) so the plumbing
  * accepts any blob.
  *
  * Format references are the public specs: Netpbm pgm(5)/ppm(5) and
  * the Microsoft/IBM RIFF WAVE format (fmt chunk 16, PCM).
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
  case object Unknown extends Kind

  def detect(bytes: Array[Byte]): Kind =
    if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5') Pgm
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
