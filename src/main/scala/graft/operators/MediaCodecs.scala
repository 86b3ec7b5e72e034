package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM media codecs for [[Multimodal.decodeMedia]]'s REAL decode path:
  *
  *  - hand-walked RIFF/WAVE (PCM) and BMP (BITMAPINFOHEADER, 24-bit) —
  *    public specifications, genuine header validation + integer feature
  *    math;
  *  - PNG and JPEG through `javax.imageio.ImageIO`, which SHIPS IN EVERY
  *    STOCK JDK (the PNG codec is pure Java, the JPEG codec is
  *    JDK-bundled) — no native libraries, no extra dependencies. PNG is
  *    lossless, so decoded pixel sums are exactly the generator's
  *    closed-form arithmetic and oracle-checkable; JPEG decode is exact
  *    per JDK build but decoder-version-dependent across JDKs, so its
  *    features are unit-pinned rather than oracle'd.
  *
  * Only genuinely codec-less CONTAINERS (MP4, FLAC) remain on the
  * documented stub. All extracted features are integer sums, so results
  * are bit-reproducible under any partitioning.
  */
object MediaCodecs {

  // ------------------------------------------------------------------ WAV

  /** Parsed PCM WAV: format fields from the `fmt ` chunk, integer sample
    * features from the `data` chunk. `sumAbs`/`peak` are over samples of
    * ALL channels; duration is integer ms (samples * 1000 / rate). */
  final case class WavInfo(
      channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, durationMs: Long, sumAbs: Long, peak: Int)

  /** Encode PCM16 mono/interleaved samples as a canonical RIFF/WAVE file
    * (RIFF | size | WAVE | fmt-chunk(16) | data-chunk). All multi-byte
    * fields little-endian per the RIFF spec. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
                     samples: Array[Short]): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0)
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(36 + dataLen) // riff payload size
    buf.put("WAVE".getBytes(StandardCharsets.US_ASCII))
    buf.put("fmt ".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(16)                    // PCM fmt chunk length
    buf.putShort(1)                   // audio format 1 = PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                  // bits per sample
    buf.put("data".getBytes(StandardCharsets.US_ASCII))
    buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM16 WAV by walking the RIFF chunk list — unknown chunks
    * (LIST, fact, ...) are skipped by their declared length, exactly how a
    * real reader tolerates metadata chunks; `fmt ` must precede `data`. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 12, s"WAV too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val a = new Array[Byte](4); bb.get(a); new String(a, StandardCharsets.US_ASCII)
    }
    require(fourcc() == "RIFF", "not a RIFF file")
    bb.getInt // riff size (trusted only for bounds below)
    require(fourcc() == "WAVE", "not a WAVE form")
    var channels = -1; var rate = -1; var bits = -1
    var info: Option[WavInfo] = None
    while (info.isEmpty && bb.remaining() >= 8) {
      val id = fourcc()
      val len = bb.getInt
      require(len >= 0 && bb.remaining() >= len, s"chunk '$id' overruns: $len")
      id match {
        case "fmt " =>
          val p0 = bb.position()
          val fmt = bb.getShort
          require(fmt == 1, s"only PCM supported, got format $fmt")
          channels = bb.getShort
          rate = bb.getInt
          bb.getInt; bb.getShort // byte rate, block align
          bits = bb.getShort
          require(bits == 16, s"only PCM16 supported, got $bits bits")
          bb.position(p0 + len + (len & 1)) // chunks are word-aligned
        case "data" =>
          require(channels > 0 && rate > 0, "data chunk before fmt")
          val n = len / 2
          var sumAbs = 0L
          var peak = 0
          var i = 0
          while (i < n) {
            val s = bb.getShort.toInt
            sumAbs += math.abs(s)
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          info = Some(WavInfo(channels, rate, bits, n / channels,
            (n / channels) * 1000L / rate, sumAbs, peak))
        case _ => // skip unknown chunk (word-aligned)
          bb.position(bb.position() + len + (len & 1))
      }
    }
    info.getOrElse(throw new IllegalArgumentException("no data chunk"))
  }

  // ------------------------------------------------------------------ BMP

  /** Parsed 24-bit BMP: dimensions from BITMAPINFOHEADER, per-channel
    * integer pixel sums from the (bottom-up, 4-byte-row-padded) array. */
  final case class BmpInfo(
      width: Int, height: Int, bitsPerPixel: Int,
      sumR: Long, sumG: Long, sumB: Long)

  private def bmpRowStride(width: Int): Int = (width * 3 + 3) & ~3

  /** Encode a 24-bit uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    * bottom-up rows padded to 4 bytes, BGR byte order — the spec layout). */
  def encodeBmp24(width: Int, height: Int,
                  pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0)
    val stride = bmpRowStride(width)
    val dataLen = stride * height
    val buf = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataLen) // file size
    buf.putInt(0)            // reserved
    buf.putInt(54)           // pixel array offset
    buf.putInt(40)           // BITMAPINFOHEADER size
    buf.putInt(width)
    buf.putInt(height)       // positive = bottom-up
    buf.putShort(1)          // planes
    buf.putShort(24)         // bpp
    buf.putInt(0)            // BI_RGB (uncompressed)
    buf.putInt(dataLen)
    buf.putInt(2835).putInt(2835) // 72 DPI
    buf.putInt(0).putInt(0)  // palette
    var y = height - 1       // bottom-up storage
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR
        x += 1
      }
      var pad = stride - width * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** Decode a 24-bit BMP: validate the two headers, honor the declared
    * pixel-array offset and row padding, sum channels. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.get() == 'B'.toByte && bb.get() == 'M'.toByte, "not a BMP")
    bb.getInt; bb.getInt
    val pixelOffset = bb.getInt
    val hdrSize = bb.getInt
    require(hdrSize >= 40, s"need BITMAPINFOHEADER, got header size $hdrSize")
    val width = bb.getInt
    val height = bb.getInt
    require(width > 0 && height > 0, s"unsupported dims ${width}x$height")
    bb.getShort // planes
    val bpp = bb.getShort
    require(bpp == 24, s"only 24-bit supported, got $bpp")
    val compression = bb.getInt
    require(compression == 0, s"only BI_RGB supported, got $compression")
    val stride = bmpRowStride(width)
    require(pixelOffset + stride.toLong * height <= bytes.length,
      "pixel array overruns the file")
    var sumR = 0L; var sumG = 0L; var sumB = 0L
    var y = 0
    while (y < height) {
      var p = pixelOffset + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        sumB += bytes(p) & 0xff
        sumG += bytes(p + 1) & 0xff
        sumR += bytes(p + 2) & 0xff
        p += 3; x += 1
      }
      y += 1
    }
    BmpInfo(width, height, bpp, sumR, sumG, sumB)
  }

  // -------------------------------------------------------- PNG/JPEG (JDK)

  /** Decoded raster image: dimensions + per-channel sRGB integer sums. */
  final case class ImageInfo(
      width: Int, height: Int, sumR: Long, sumG: Long, sumB: Long)

  /** Decode any ImageIO-recognized raster (PNG, JPEG, GIF, BMP — the
    * readers bundled with the JDK) and sum sRGB channels row by row.
    * Rejects unrecognized bytes loudly. */
  def decodeImage(bytes: Array[Byte]): ImageInfo = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "no JDK ImageIO reader recognized the payload")
    val w = img.getWidth; val h = img.getHeight
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >>> 16) & 0xff; sg += (p >>> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    ImageInfo(w, h, sr, sg, sb)
  }

  private def rasterOf(width: Int, height: Int,
                       pixel: (Int, Int) => (Int, Int, Int)): java.awt.image.BufferedImage = {
    require(width > 0 && height > 0)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pixel(x, y)
        img.setRGB(x, y, ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff))
        x += 1
      }
      y += 1
    }
    img
  }

  /** Encode as PNG with the JDK's pure-Java writer — lossless, so
    * `decodeImage(encodePng(...))` reproduces the generator arithmetic
    * bit-exactly (the oracle contract). */
  def encodePng(width: Int, height: Int,
                pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(rasterOf(width, height, pixel), "png", bos),
      "JDK PNG writer missing")
    bos.toByteArray
  }

  /** Encode as JPEG with the JDK-bundled writer (lossy — decode features
    * are unit-pinned, not oracle'd). */
  def encodeJpeg(width: Int, height: Int,
                 pixel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(rasterOf(width, height, pixel), "jpg", bos),
      "JDK JPEG writer missing")
    bos.toByteArray
  }
}
