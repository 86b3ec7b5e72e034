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
  *    features are unit-pinned rather than oracle'd;
  *  - MP4 (ISO-BMFF box walk: ftyp brand, trak count, per-track codec
  *    fourcc, mdhd duration/timescale, stsz sample counts) and FLAC
  *    (STREAMINFO bit-fields + frame-sync sanity) at the CONTAINER/
  *    METADATA level — full sample decode needs native codecs, but the
  *    container fields are exactly what a curation pipeline filters on
  *    (resolution, duration, codec, track shape), and they are
  *    all-integer, so oracle-checkable.
  *
  * All extracted features are integer sums/fields, so results are
  * bit-reproducible under any partitioning.
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

  // ------------------------------------------------------ MP4 (ISO-BMFF)

  /** One MP4 track as the box walk sees it: handler ('vide'/'soun'), the
    * stsd entry's codec fourcc, tkhd display dims (0 for audio), mdhd
    * media timescale/duration, stsz sample count. */
  final case class Mp4Track(
      handler: String, codec: String, width: Int, height: Int,
      mediaTimescale: Long, mediaDuration: Long, sampleCount: Long)

  /** Parsed ISO-BMFF container metadata: ftyp major brand, mvhd movie
    * timescale/duration (durationMs = duration·1000/timescale, floor),
    * track count, the first video track's display dims, every track's
    * stsd codec fourcc (in file order), total stsz sample count across
    * tracks, and the first audio track's mdhd timescale (== its sample
    * rate by ISO-BMFF convention, 0 if no audio track). */
  final case class Mp4Info(
      brand: String, timescale: Long, duration: Long, durationMs: Long,
      nTracks: Int, width: Int, height: Int, codecs: Seq[String],
      nSamples: Long, audioRate: Long)

  private def asciiBytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.US_ASCII)

  /** One big-endian ISO-BMFF box: `size(4) | fourcc(4) | payload`. */
  private def mp4Box(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
    require(fourcc.length == 4)
    val len = 8 + payload.map(_.length).sum
    val buf = ByteBuffer.allocate(len) // ISO-BMFF is big-endian (ByteBuffer default)
    buf.putInt(len)
    buf.put(asciiBytes(fourcc))
    payload.foreach(buf.put)
    buf.array()
  }

  private def fullBoxHeader(version: Int, flags: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt((version << 24) | (flags & 0xffffff)).array()

  /** Identity transform matrix (9 × 16.16/2.30 fixed — the spec default). */
  private val mp4IdentityMatrix: Array[Byte] = {
    val b = ByteBuffer.allocate(36)
    b.putInt(0x00010000).putInt(0).putInt(0)
    b.putInt(0).putInt(0x00010000).putInt(0)
    b.putInt(0).putInt(0).putInt(0x40000000)
    b.array()
  }

  /** Encode a minimal-but-spec-shaped MP4: `ftyp | moov(mvhd, trak*) |
    * mdat`. Each trak carries tkhd (16.16 display dims), mdia(mdhd
    * timescale/duration, hdlr, minf(stbl(stsd with the codec fourcc,
    * stts, stsz constant-size form, stco))). Metadata-level: the mdat
    * payload is opaque filler — the decode contract is container fields,
    * not samples. */
  def encodeMp4Meta(brand: String, timescale: Long, duration: Long,
                    tracks: Seq[Mp4Track],
                    mdat: Array[Byte] = Array.emptyByteArray): Array[Byte] = {
    require(brand.length == 4 && timescale > 0 && tracks.nonEmpty)
    val ftyp = mp4Box("ftyp",
      asciiBytes(brand),
      ByteBuffer.allocate(4).putInt(0x200).array(), // minor version
      asciiBytes("isom"), asciiBytes("mp42"))       // compatible brands
    val mvhd = mp4Box("mvhd", fullBoxHeader(0, 0), {
      val b = ByteBuffer.allocate(96)
      b.putInt(0).putInt(0)                       // creation, modification
      b.putInt(timescale.toInt).putInt(duration.toInt)
      b.putInt(0x00010000)                        // rate 1.0
      b.putShort(0x0100.toShort).putShort(0)      // volume 1.0, reserved
      b.putLong(0)                                // reserved
      b.put(mp4IdentityMatrix)
      (0 until 6).foreach(_ => b.putInt(0))       // pre_defined
      b.putInt(tracks.size + 1)                   // next_track_ID
      b.array()
    })
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val tkhd = mp4Box("tkhd", fullBoxHeader(0, 7), { // enabled|in-movie|in-preview
        val b = ByteBuffer.allocate(80)
        b.putInt(0).putInt(0)                     // creation, modification
        b.putInt(i + 1).putInt(0)                 // track_ID, reserved
        b.putInt(duration.toInt)
        b.putLong(0)                              // reserved
        b.putShort(0).putShort(0)                 // layer, alternate_group
        b.putShort(if (t.handler == "soun") 0x0100.toShort else 0).putShort(0)
        b.put(mp4IdentityMatrix)
        b.putInt(t.width << 16).putInt(t.height << 16) // 16.16 fixed
        b.array()
      })
      val mdhd = mp4Box("mdhd", fullBoxHeader(0, 0), {
        val b = ByteBuffer.allocate(20)
        b.putInt(0).putInt(0)                     // creation, modification
        b.putInt(t.mediaTimescale.toInt).putInt(t.mediaDuration.toInt)
        b.putShort(0x55c4.toShort).putShort(0)    // language 'und', pre_defined
        b.array()
      })
      val hdlr = mp4Box("hdlr", fullBoxHeader(0, 0),
        ByteBuffer.allocate(4).array(),           // pre_defined
        asciiBytes(t.handler),
        new Array[Byte](12),                      // reserved
        Array[Byte](0))                           // empty null-terminated name
      // sample description: entry fourcc is all the walk reads; the entry
      // body keeps the SampleEntry base fields (6 reserved + data_ref_index)
      val stsd = mp4Box("stsd", fullBoxHeader(0, 0),
        ByteBuffer.allocate(4).putInt(1).array(), // entry_count
        mp4Box(t.codec, new Array[Byte](6),
          ByteBuffer.allocate(2).putShort(1).array()))
      val stts = mp4Box("stts", fullBoxHeader(0, 0), {
        val b = ByteBuffer.allocate(12)
        b.putInt(1)                               // entry_count
        b.putInt(t.sampleCount.toInt)
        b.putInt(if (t.sampleCount > 0) (t.mediaDuration / math.max(t.sampleCount, 1)).toInt else 0)
        b.array()
      })
      // constant-size form: sample_size != 0 => sample_count field, no table
      val stsz = mp4Box("stsz", fullBoxHeader(0, 0), {
        val b = ByteBuffer.allocate(8)
        b.putInt(1).putInt(t.sampleCount.toInt)
        b.array()
      })
      val stco = mp4Box("stco", fullBoxHeader(0, 0),
        ByteBuffer.allocate(4).array())           // entry_count 0
      val stbl = mp4Box("stbl", stsd, stts, stsz, stco)
      val minf = mp4Box("minf", stbl)
      val mdia = mp4Box("mdia", mdhd, hdlr, minf)
      mp4Box("trak", tkhd, mdia)
    }
    val moov = mp4Box("moov", (mvhd +: traks): _*)
    val mdatBox = mp4Box("mdat", mdat)
    ftyp ++ moov ++ mdatBox
  }

  /** Walk `bytes[from, to)` as a run of sibling boxes, invoking `f(fourcc,
    * payloadStart, payloadEnd)` per box. Validates every declared size
    * against the enclosing bounds — a forged size cannot read outside
    * them. Handles the spec's size forms: 1 = 64-bit largesize follows,
    * 0 = box extends to the end of the enclosure. */
  private def walkBoxes(bytes: Array[Byte], from: Int, to: Int)
                       (f: (String, Int, Int) => Unit): Unit = {
    var p = from
    while (p < to) {
      require(to - p >= 8, s"truncated box header at $p")
      val bb = ByteBuffer.wrap(bytes, p, to - p)
      val size32 = bb.getInt.toLong & 0xffffffffL
      val fourcc = {
        val a = new Array[Byte](4); bb.get(a); new String(a, StandardCharsets.US_ASCII)
      }
      val (payloadStart, boxEnd) =
        if (size32 == 0) (p + 8, to) // to end of enclosure
        else if (size32 == 1) {      // 64-bit largesize
          require(to - p >= 16, s"truncated largesize box at $p")
          val size64 = bb.getLong
          require(size64 >= 16 && size64 <= (to - p).toLong,
            s"box '$fourcc' largesize $size64 overruns enclosure")
          (p + 16, p + size64.toInt)
        } else {
          require(size32 >= 8 && size32 <= (to - p).toLong,
            s"box '$fourcc' size $size32 overruns enclosure")
          (p + 8, p + size32.toInt)
        }
      f(fourcc, payloadStart, boxEnd)
      p = boxEnd
    }
  }

  private def be32(bytes: Array[Byte], at: Int): Long =
    ByteBuffer.wrap(bytes, at, 4).getInt.toLong & 0xffffffffL
  private def be64(bytes: Array[Byte], at: Int): Long =
    ByteBuffer.wrap(bytes, at, 8).getLong

  /** Decode ISO-BMFF container metadata by walking the box tree: ftyp
    * (must lead) → brand; moov/mvhd (version 0 and 1) → timescale,
    * duration; per trak: tkhd → 16.16 display dims, mdia/mdhd → media
    * timescale ( == sample rate for audio), mdia/hdlr → handler,
    * stbl/stsd → first entry's codec fourcc, stbl/stsz → sample count
    * (constant-size and per-sample-table forms). Unknown boxes skip by
    * their declared size — every size is bounds-checked against its
    * enclosure, so truncated or forged files fail loudly instead of
    * reading wild. */
  def decodeMp4(bytes: Array[Byte]): Mp4Info = {
    require(bytes.length >= 16, s"MP4 too short: ${bytes.length}")
    require(new String(bytes, 4, 4, StandardCharsets.US_ASCII) == "ftyp",
      "not an ISO-BMFF file (no leading ftyp)")
    var brand = ""
    var timescale = 0L; var duration = 0L
    var nTracks = 0
    var width = 0; var height = 0
    val codecs = scala.collection.mutable.ArrayBuffer[String]()
    var nSamples = 0L
    var audioRate = 0L
    walkBoxes(bytes, 0, bytes.length) {
      case ("ftyp", s, e) =>
        require(e - s >= 4, "ftyp too short for a major brand")
        brand = new String(bytes, s, 4, StandardCharsets.US_ASCII)
      case ("moov", moovS, moovE) =>
        walkBoxes(bytes, moovS, moovE) {
          case ("mvhd", s, e) =>
            require(e - s >= 20, "mvhd too short")
            val v = bytes(s) & 0xff
            if (v == 0) { timescale = be32(bytes, s + 12); duration = be32(bytes, s + 16) }
            else {
              require(e - s >= 32, "mvhd v1 too short")
              timescale = be32(bytes, s + 20); duration = be64(bytes, s + 24)
            }
          case ("trak", trakS, trakE) =>
            nTracks += 1
            var handler = ""
            var trkW = 0; var trkH = 0
            var mediaTs = 0L
            walkBoxes(bytes, trakS, trakE) {
              case ("tkhd", s, e) =>
                val v = bytes(s) & 0xff
                val dimsAt = if (v == 0) s + 76 else s + 88
                require(e >= dimsAt + 8, "tkhd too short for display dims")
                trkW = (be32(bytes, dimsAt) >> 16).toInt      // 16.16 fixed
                trkH = (be32(bytes, dimsAt + 4) >> 16).toInt
              case ("mdia", mdiaS, mdiaE) =>
                walkBoxes(bytes, mdiaS, mdiaE) {
                  case ("mdhd", s, e) =>
                    require(e - s >= 20, "mdhd too short")
                    val v = bytes(s) & 0xff
                    mediaTs =
                      if (v == 0) be32(bytes, s + 12)
                      else { require(e - s >= 28, "mdhd v1 too short"); be32(bytes, s + 20) }
                  case ("hdlr", s, e) =>
                    require(e - s >= 12, "hdlr too short")
                    handler = new String(bytes, s + 8, 4, StandardCharsets.US_ASCII)
                  case ("minf", minfS, minfE) =>
                    walkBoxes(bytes, minfS, minfE) {
                      case ("stbl", stblS, stblE) =>
                        walkBoxes(bytes, stblS, stblE) {
                          case ("stsd", s, e) =>
                            require(e - s >= 16, "stsd too short")
                            val entries = be32(bytes, s + 4)
                            require(entries >= 1, "stsd with no entries")
                            // first entry is itself a box: fourcc at +4
                            val entrySize = be32(bytes, s + 8)
                            require(entrySize >= 8 && s + 8 + entrySize <= e,
                              "stsd entry overruns")
                            codecs += new String(bytes, s + 12, 4, StandardCharsets.US_ASCII)
                          case ("stsz", s, e) =>
                            require(e - s >= 12, "stsz too short")
                            val constSize = be32(bytes, s + 4)
                            val count = be32(bytes, s + 8)
                            if (constSize == 0)
                              require(e - s >= 12 + 4 * count,
                                s"stsz table overruns: $count entries")
                            nSamples += count
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            if (handler == "soun" && audioRate == 0L) audioRate = mediaTs
            if (handler == "vide" && width == 0 && trkW > 0) { width = trkW; height = trkH }
          case _ => ()
        }
      case _ => () // mdat, free, ... — skipped by declared size
    }
    require(timescale > 0, "no mvhd (or zero timescale)")
    require(nTracks > 0, "no trak boxes")
    Mp4Info(brand, timescale, duration, duration * 1000L / timescale,
      nTracks, width, height, codecs.toSeq, nSamples, audioRate)
  }

  // ------------------------------------------------------------------ FLAC

  /** Parsed FLAC STREAMINFO: block sizes, bit-packed sample rate (20 bits),
    * channels (3 bits, stored −1), bits/sample (5 bits, stored −1), total
    * samples (36 bits); durationMs = totalSamples·1000/sampleRate, floor. */
  final case class FlacInfo(
      minBlock: Int, maxBlock: Int, sampleRate: Int, channels: Int,
      bitsPerSample: Int, totalSamples: Long, durationMs: Long)

  /** Encode a FLAC header: `fLaC` magic, the mandatory STREAMINFO metadata
    * block (34 bytes, bit-packed per the spec), a small PADDING block
    * marked last (exercises the block walk), then one frame-header sync
    * pair (0xFF 0xF8 — the 14-bit sync code + fixed-blocksize strategy)
    * so the decoder's frame-sanity scan has a genuine target. Audio
    * samples are not encoded — container/metadata level, like
    * [[encodeMp4Meta]]. */
  def encodeFlacMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                     totalSamples: Long,
                     minBlock: Int = 4096, maxBlock: Int = 4096): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(totalSamples >= 0 && totalSamples < (1L << 36))
    val buf = ByteBuffer.allocate(4 + 4 + 34 + 4 + 4 + 4)
    buf.put(asciiBytes("fLaC"))
    buf.put(0.toByte)                      // not-last | type 0 = STREAMINFO
    buf.put(0.toByte).put(0.toByte).put(34.toByte) // 24-bit length
    buf.putShort(minBlock.toShort).putShort(maxBlock.toShort)
    // min/max frame size (24 bits each): 0 = unknown
    buf.put(new Array[Byte](6))
    // 64 bits: rate(20) | channels-1(3) | bits-1(5) | totalSamples(36)
    buf.putLong((sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples)
    buf.put(new Array[Byte](16))           // md5 of unencoded audio: 0 = unknown
    buf.put(0x81.toByte)                   // last | type 1 = PADDING
    buf.put(0.toByte).put(0.toByte).put(4.toByte)
    buf.put(new Array[Byte](4))
    // first frame header's sync pair: 11111111 111110 0 0
    buf.put(0xff.toByte).put(0xf8.toByte).put(0x69.toByte).put(0x18.toByte)
    buf.array()
  }

  /** Decode a FLAC header: validate the magic, walk the metadata blocks by
    * their declared 24-bit lengths (STREAMINFO must lead with length 34 —
    * the spec's mandate), unpack the bit-fields, then sanity-check that
    * the bytes after the last metadata block start with the 14-bit frame
    * sync code. Truncated or forged lengths fail loudly. */
  def decodeFlac(bytes: Array[Byte]): FlacInfo = {
    require(bytes.length >= 4 + 4 + 34, s"FLAC too short: ${bytes.length}")
    require(new String(bytes, 0, 4, StandardCharsets.US_ASCII) == "fLaC",
      "not a FLAC file (bad magic)")
    var p = 4
    var info: Option[FlacInfo] = None
    var last = false
    var first = true
    while (!last) {
      require(bytes.length - p >= 4, s"truncated metadata block header at $p")
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val blockType = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      require(bytes.length - (p + 4) >= len,
        s"metadata block type $blockType length $len overruns the file")
      if (first) {
        require(blockType == 0, s"first metadata block must be STREAMINFO, got $blockType")
        require(len == 34, s"STREAMINFO must be 34 bytes, got $len")
        val s = p + 4
        val minBlock = ((bytes(s) & 0xff) << 8) | (bytes(s + 1) & 0xff)
        val maxBlock = ((bytes(s + 2) & 0xff) << 8) | (bytes(s + 3) & 0xff)
        val packed = be64(bytes, s + 10)
        val rate = (packed >>> 44).toInt
        val channels = ((packed >>> 41) & 0x7).toInt + 1
        val bits = ((packed >>> 36) & 0x1f).toInt + 1
        val total = packed & ((1L << 36) - 1)
        require(rate > 0, "STREAMINFO sample rate is 0")
        info = Some(FlacInfo(minBlock, maxBlock, rate, channels, bits, total,
          total * 1000L / rate))
        first = false
      }
      p += 4 + len
    }
    // frame-header sanity: the audio stream (if present) must open with the
    // sync code 0b11111111_111110xx
    if (p + 2 <= bytes.length)
      require((bytes(p) & 0xff) == 0xff && (bytes(p + 1) & 0xfc) == 0xf8,
        "bytes after the metadata blocks do not start with a frame sync code")
    info.get
  }
}
