package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Pure-JVM codecs for the two self-describing media containers a stock JVM
  * can parse without native libraries: RIFF/WAVE (PCM) and BMP
  * (BITMAPINFOHEADER, 24-bit uncompressed). These give
  * [[Multimodal.decodeMedia]] a REAL decode path — genuine header walking,
  * sample/pixel extraction, integer feature math — alongside the documented
  * stub for container formats whose codecs aren't in this build (JPEG/MP4/
  * FLAC need native decoders).
  *
  * Both formats are public specifications (RIFF: Microsoft/IBM Multimedia
  * Programming Interface 1991; BMP: Windows BITMAPINFOHEADER). All
  * extracted features are integer sums, so results are bit-reproducible
  * under any partitioning and recomputable by the SQL oracle.
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
}
