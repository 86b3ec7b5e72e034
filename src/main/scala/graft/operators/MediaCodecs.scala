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
    // v0 boxes hold these as unsigned 32-bit; a silent .toInt truncation
    // above 0xffffffff would corrupt the round-trip
    require(timescale <= 0xffffffffL, s"timescale $timescale exceeds the mvhd v0 u32 field")
    require(duration >= 0 && duration <= 0xffffffffL,
      s"duration $duration exceeds the mvhd/tkhd v0 u32 field")
    tracks.foreach { t =>
      require(t.mediaTimescale >= 0 && t.mediaTimescale <= 0xffffffffL,
        s"mediaTimescale ${t.mediaTimescale} exceeds the mdhd v0 u32 field")
      require(t.mediaDuration >= 0 && t.mediaDuration <= 0xffffffffL,
        s"mediaDuration ${t.mediaDuration} exceeds the mdhd v0 u32 field")
      require(t.sampleCount >= 0 && t.sampleCount <= 0xffffffffL,
        s"sampleCount ${t.sampleCount} exceeds the stts/stsz u32 field")
    }
    val ftyp = ftypBox(brand)
    val mvhd = mvhdBox(timescale, duration, tracks.size)
    val traks = tracks.zipWithIndex.map { case (t, i) =>
      val stts = sttsBox(t.sampleCount,
        if (t.sampleCount > 0) t.mediaDuration / math.max(t.sampleCount, 1) else 0L)
      // constant-size form: sample_size != 0 => sample_count field, no table
      val stsz = mp4Box("stsz", fullBoxHeader(0, 0), {
        val b = ByteBuffer.allocate(8)
        b.putInt(1).putInt(t.sampleCount.toInt)
        b.array()
      })
      val stco = mp4Box("stco", fullBoxHeader(0, 0),
        ByteBuffer.allocate(4).array())           // entry_count 0
      val stbl = mp4Box("stbl", stsdBox(t.codec), stts, stsz, stco)
      trakBox(t, i + 1, duration, stbl)
    }
    val moov = mp4Box("moov", (mvhd +: traks): _*)
    val mdatBox = mp4Box("mdat", mdat)
    ftyp ++ moov ++ mdatBox
  }

  private def ftypBox(brand: String): Array[Byte] = mp4Box("ftyp",
    asciiBytes(brand),
    ByteBuffer.allocate(4).putInt(0x200).array(), // minor version
    asciiBytes("isom"), asciiBytes("mp42"))       // compatible brands

  private def mvhdBox(timescale: Long, duration: Long, nTracks: Int): Array[Byte] =
    mp4Box("mvhd", fullBoxHeader(0, 0), {
      val b = ByteBuffer.allocate(96)
      b.putInt(0).putInt(0)                       // creation, modification
      b.putInt(timescale.toInt).putInt(duration.toInt)
      b.putInt(0x00010000)                        // rate 1.0
      b.putShort(0x0100.toShort).putShort(0)      // volume 1.0, reserved
      b.putLong(0)                                // reserved
      b.put(mp4IdentityMatrix)
      (0 until 6).foreach(_ => b.putInt(0))       // pre_defined
      b.putInt(nTracks + 1)                       // next_track_ID
      b.array()
    })

  private def sttsBox(sampleCount: Long, delta: Long): Array[Byte] =
    mp4Box("stts", fullBoxHeader(0, 0), {
      val b = ByteBuffer.allocate(12)
      b.putInt(1)                                 // entry_count
      b.putInt(sampleCount.toInt)
      b.putInt(delta.toInt)
      b.array()
    })

  /** sample description: entry fourcc is all the walk reads; the entry
    * body keeps the SampleEntry base fields (6 reserved + data_ref_index) */
  private def stsdBox(codec: String): Array[Byte] =
    mp4Box("stsd", fullBoxHeader(0, 0),
      ByteBuffer.allocate(4).putInt(1).array(),   // entry_count
      mp4Box(codec, new Array[Byte](6),
        ByteBuffer.allocate(2).putShort(1).array()))

  /** One trak box around a caller-built stbl: tkhd (16.16 display dims),
    * mdia(mdhd, hdlr, minf(stbl)). */
  private def trakBox(t: Mp4Track, trackId: Int, duration: Long,
                      stbl: Array[Byte]): Array[Byte] = {
    val tkhd = mp4Box("tkhd", fullBoxHeader(0, 7), { // enabled|in-movie|in-preview
      val b = ByteBuffer.allocate(80)
      b.putInt(0).putInt(0)                       // creation, modification
      b.putInt(trackId).putInt(0)                 // track_ID, reserved
      b.putInt(duration.toInt)
      b.putLong(0)                                // reserved
      b.putShort(0).putShort(0)                   // layer, alternate_group
      b.putShort(if (t.handler == "soun") 0x0100.toShort else 0).putShort(0)
      b.put(mp4IdentityMatrix)
      b.putInt(t.width << 16).putInt(t.height << 16) // 16.16 fixed
      b.array()
    })
    val mdhd = mp4Box("mdhd", fullBoxHeader(0, 0), {
      val b = ByteBuffer.allocate(20)
      b.putInt(0).putInt(0)                       // creation, modification
      b.putInt(t.mediaTimescale.toInt).putInt(t.mediaDuration.toInt)
      b.putShort(0x55c4.toShort).putShort(0)      // language 'und', pre_defined
      b.array()
    })
    val hdlr = mp4Box("hdlr", fullBoxHeader(0, 0),
      ByteBuffer.allocate(4).array(),             // pre_defined
      asciiBytes(t.handler),
      new Array[Byte](12),                        // reserved
      Array[Byte](0))                             // empty null-terminated name
    val minf = mp4Box("minf", stbl)
    val mdia = mp4Box("mdia", mdhd, hdlr, minf)
    mp4Box("trak", tkhd, mdia)
  }

  /** One track's REAL sample layout for [[encodeMp4Samples]]: the stsz
    * per-sample size table, uniform chunking (`samplesPerChunk` per chunk,
    * the last chunk short). `track.sampleCount` must equal
    * `sampleSizes.length`. `syncEvery` > 1 emits an stss box marking every
    * `syncEvery`-th sample (1-based 1, 1+k, ...) as a sync sample /
    * keyframe (1 = no stss box = ALL samples sync, the spec default);
    * `cttsOffsets` (per-sample, same length as sizes) emits a ctts
    * composition-offset table, run-length-compressed, so pts = dts +
    * offset. */
  final case class Mp4SampleSpec(track: Mp4Track, sampleSizes: Seq[Int],
                                 samplesPerChunk: Int,
                                 syncEvery: Int = 1,
                                 cttsOffsets: Seq[Int] = Nil)

  /** Deterministic content byte `j` of sample `i` of track ordinal `t` —
    * what [[encodeMp4Samples]] writes and what a sample-range test reads
    * back to prove the resolved byte ranges land on the right bytes. */
  def mp4SampleByte(t: Int, i: Int, j: Int): Byte =
    ((t * 31 + i * 7 + j) % 251).toByte

  /** Encode an MP4 whose sample tables are REAL: stsz in the per-sample
    * table form, stsc sample-to-chunk runs, stco (or co64) chunk offsets
    * pointing into a genuine mdat laid out track-contiguously (all of
    * track 1's chunks, then track 2's, ...). stts keeps the single-run
    * form (delta = mediaDuration / sampleCount). Two-pass: the moov's size
    * depends only on table COUNTS, so it is built once with zero offsets
    * to measure, then rebuilt with the real ones. Sample content bytes are
    * [[mp4SampleByte]]'s closed form. */
  def encodeMp4Samples(brand: String, timescale: Long, duration: Long,
                       specs: Seq[Mp4SampleSpec],
                       useCo64: Boolean = false): Array[Byte] = {
    require(brand.length == 4 && timescale > 0 && specs.nonEmpty)
    require(timescale <= 0xffffffffL && duration >= 0 && duration <= 0xffffffffL)
    specs.foreach { sp =>
      require(sp.track.sampleCount == sp.sampleSizes.length.toLong,
        s"track.sampleCount ${sp.track.sampleCount} != sizes ${sp.sampleSizes.length}")
      require(sp.samplesPerChunk >= 1 && sp.sampleSizes.forall(_ >= 0))
      require(sp.sampleSizes.nonEmpty, "a sample-table track needs samples")
      require(sp.syncEvery >= 1, s"syncEvery ${sp.syncEvery}")
      require(sp.cttsOffsets.isEmpty ||
        sp.cttsOffsets.length == sp.sampleSizes.length,
        s"cttsOffsets ${sp.cttsOffsets.length} != sizes ${sp.sampleSizes.length}")
    }
    def chunksOf(sp: Mp4SampleSpec): Seq[Seq[Int]] =
      sp.sampleSizes.grouped(sp.samplesPerChunk).toSeq
    def buildMoov(chunkOffsets: Seq[Seq[Long]]): Array[Byte] = {
      val traks = specs.zip(chunkOffsets).zipWithIndex.map {
        case ((sp, offs), i) =>
          val t = sp.track
          val n = sp.sampleSizes.length
          val stts = sttsBox(n.toLong, t.mediaDuration / math.max(n, 1))
          val stsz = mp4Box("stsz", fullBoxHeader(0, 0), {
            val b = ByteBuffer.allocate(8 + 4 * n)
            b.putInt(0).putInt(n)                 // table form: sizes follow
            sp.sampleSizes.foreach(b.putInt)
            b.array()
          })
          // stsc runs: a new entry whenever the per-chunk sample count
          // changes (uniform chunking => at most two: the run + short tail)
          val chunkLens = chunksOf(sp).map(_.length)
          val runs = chunkLens.zipWithIndex
            .filter { case (len, k) => k == 0 || chunkLens(k - 1) != len }
            .map { case (len, k) => (k + 1, len) } // first_chunk is 1-based
          val stsc = mp4Box("stsc", fullBoxHeader(0, 0), {
            val b = ByteBuffer.allocate(4 + 12 * runs.size)
            b.putInt(runs.size)
            runs.foreach { case (first, len) =>
              b.putInt(first).putInt(len).putInt(1) // sample_description_index
            }
            b.array()
          })
          val co = if (useCo64)
            mp4Box("co64", fullBoxHeader(0, 0), {
              val b = ByteBuffer.allocate(4 + 8 * offs.size)
              b.putInt(offs.size); offs.foreach(b.putLong); b.array()
            })
          else
            mp4Box("stco", fullBoxHeader(0, 0), {
              val b = ByteBuffer.allocate(4 + 4 * offs.size)
              b.putInt(offs.size)
              offs.foreach { o =>
                require(o <= 0xffffffffL, s"chunk offset $o needs co64")
                b.putInt(o.toInt)
              }
              b.array()
            })
          // stss: sync-sample numbers (1-based), only when not all-sync —
          // a track WITHOUT stss is all-keyframe per spec
          val stss =
            if (sp.syncEvery <= 1) Array.emptyByteArray
            else {
              val syncs = (1 to n by sp.syncEvery).toSeq
              mp4Box("stss", fullBoxHeader(0, 0), {
                val b = ByteBuffer.allocate(4 + 4 * syncs.size)
                b.putInt(syncs.size); syncs.foreach(b.putInt); b.array()
              })
            }
          // ctts: composition offsets (pts = dts + offset), run-length
          // compressed like a real muxer writes it
          val ctts =
            if (sp.cttsOffsets.isEmpty) Array.emptyByteArray
            else {
              val runs = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
              sp.cttsOffsets.foreach { o =>
                if (runs.nonEmpty && runs.last._2 == o)
                  runs(runs.size - 1) = (runs.last._1 + 1, o)
                else runs += ((1, o))
              }
              mp4Box("ctts", fullBoxHeader(0, 0), {
                val b = ByteBuffer.allocate(4 + 8 * runs.size)
                b.putInt(runs.size)
                runs.foreach { case (c, o) => b.putInt(c).putInt(o) }
                b.array()
              })
            }
          val stbl = mp4Box("stbl",
            (Seq(stsdBox(t.codec), stts, stsz, stsc, co, stss, ctts)
              .filter(_.nonEmpty)): _*)
          trakBox(t, i + 1, duration, stbl)
      }
      mp4Box("moov", (mvhdBox(timescale, duration, specs.size) +: traks): _*)
    }
    val ftyp = ftypBox(brand)
    val zeroOffs = specs.map(sp => chunksOf(sp).map(_ => 0L))
    val moov0 = buildMoov(zeroOffs)
    val mdatStart = ftyp.length.toLong + moov0.length + 8L
    var off = mdatStart
    val realOffs = specs.map { sp =>
      chunksOf(sp).map { ch => val o = off; off += ch.map(_.toLong).sum; o }
    }
    val moov = buildMoov(realOffs)
    require(moov.length == moov0.length, "moov size must not depend on offsets")
    val payload = new Array[Byte]((off - mdatStart).toInt)
    var p = 0
    specs.zipWithIndex.foreach { case (sp, t) =>
      sp.sampleSizes.zipWithIndex.foreach { case (sz, i) =>
        var j = 0
        while (j < sz) { payload(p) = mp4SampleByte(t, i, j); p += 1; j += 1 }
      }
    }
    ftyp ++ moov ++ mp4Box("mdat", payload)
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
        if (size32 == 0) {
          // "extends to end of file" — the spec permits this ONLY for the
          // last top-level box (ISO 14496-12 §4.2); honoring it inside a
          // container would let one corrupt inner box silently swallow all
          // remaining siblings (later trak boxes) instead of failing loudly
          require(from == 0,
            s"box '$fourcc' at $p declares size 0 (to-end-of-file) inside " +
              "an enclosing box — only the last top-level box may")
          (p + 8, to)
        }
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
    var videoSeen = false
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
            // FIRST video track's dims, by a seen flag — keying on
            // width == 0 would skip a leading video track that declares
            // 0x0 display dims and misreport a later track's
            if (handler == "vide" && !videoSeen) {
              videoSeen = true; width = trkW; height = trkH
            }
          case _ => ()
        }
      case _ => () // mdat, free, ... — skipped by declared size
    }
    require(timescale > 0, "no mvhd (or zero timescale)")
    require(nTracks > 0, "no trak boxes")
    Mp4Info(brand, timescale, duration, duration * 1000L / timescale,
      nTracks, width, height, codecs.toSeq, nSamples, audioRate)
  }

  /** One resolved sample: absolute byte range in the file, decode and
    * presentation timestamps in media-timescale units (pts = dts + the
    * ctts composition offset; equal when the track has no ctts), and
    * whether it is a sync sample / keyframe (stss; a track without stss
    * is all-sync per spec). */
  final case class Mp4Sample(trackId: Int, sampleIdx: Long, byteOffset: Long,
                             size: Long, dts: Long, pts: Long,
                             isSync: Boolean)

  /** The resolved sample table plus the mdat payload's absolute start
    * (callers that want container-relative offsets subtract it). */
  final case class Mp4SampleTable(samples: Seq[Mp4Sample], mdatStart: Long)

  /** Walk the sample tables (stsz + stts + stsc + stco/co64) to per-sample
    * byte ranges — the JVM-feasible step past container metadata: a
    * curation pipeline can slice REAL frame bytes out of the file without
    * a codec. Per track:
    *
    *  - stsz gives per-sample sizes (constant and table forms);
    *  - stsc's (first_chunk, samples_per_chunk) runs say how samples pack
    *    into chunks (run extends to the next entry's first_chunk);
    *  - stco/co64 give each chunk's absolute file offset; within a chunk
    *    samples are contiguous, so sample byte offsets are chunk offset +
    *    prefix sums of the sizes;
    *  - stts's (count, delta) runs accumulate to each sample's dts.
    *
    * Every declared count and every resolved [offset, offset+size) range is
    * bounds-checked against the file — a forged table fails loudly, never
    * reads wild. Tracks without sample tables (stsz count 0) emit nothing. */
  def mp4SampleTable(bytes: Array[Byte]): Mp4SampleTable = {
    require(bytes.length >= 16, s"MP4 too short: ${bytes.length}")
    require(new String(bytes, 4, 4, StandardCharsets.US_ASCII) == "ftyp",
      "not an ISO-BMFF file (no leading ftyp)")
    val out = scala.collection.mutable.ArrayBuffer[Mp4Sample]()
    var mdatStart = -1L
    walkBoxes(bytes, 0, bytes.length) {
      case ("mdat", s, _) => if (mdatStart < 0) mdatStart = s.toLong
      case ("moov", moovS, moovE) =>
        walkBoxes(bytes, moovS, moovE) {
          case ("trak", trakS, trakE) =>
            var trackId = 0
            var sizes: IndexedSeq[Long] = IndexedSeq.empty
            var sttsRuns: Seq[(Long, Long)] = Seq.empty
            var stscRuns: Seq[(Long, Long)] = Seq.empty // (first_chunk 1-based, samples/chunk)
            var chunkOffs: IndexedSeq[Long] = IndexedSeq.empty
            var syncSet: Option[Set[Long]] = None // 1-based sample numbers; None = all sync
            var cttsRuns: Seq[(Long, Long)] = Seq.empty // (count, offset)
            walkBoxes(bytes, trakS, trakE) {
              case ("tkhd", s, e) =>
                val v = bytes(s) & 0xff
                val idAt = if (v == 0) s + 12 else s + 20
                require(e >= idAt + 4, "tkhd too short for track_ID")
                trackId = be32(bytes, idAt).toInt
              case ("mdia", mdiaS, mdiaE) =>
                walkBoxes(bytes, mdiaS, mdiaE) {
                  case ("minf", minfS, minfE) =>
                    walkBoxes(bytes, minfS, minfE) {
                      case ("stbl", stblS, stblE) =>
                        walkBoxes(bytes, stblS, stblE) {
                          case ("stsz", s, e) =>
                            require(e - s >= 12, "stsz too short")
                            val const = be32(bytes, s + 4)
                            val count = be32(bytes, s + 8)
                            // allocation bomb guard: a forged constant-size
                            // count can't be bounded by the table length, so
                            // bound it by the file (zero-size samples aside,
                            // a sane count never exceeds the byte count)
                            require(count <= bytes.length.toLong,
                              s"stsz declares $count samples in a ${bytes.length}-byte file")
                            sizes =
                              if (const != 0) IndexedSeq.fill(count.toInt)(const)
                              else {
                                require(e - s >= 12 + 4 * count,
                                  s"stsz table overruns: $count entries")
                                (0 until count.toInt)
                                  .map(i => be32(bytes, s + 12 + 4 * i))
                              }
                          case ("stts", s, e) =>
                            require(e - s >= 8, "stts too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 8 * n, s"stts table overruns: $n entries")
                            sttsRuns = (0 until n.toInt).map(i =>
                              (be32(bytes, s + 8 + 8 * i), be32(bytes, s + 12 + 8 * i)))
                          case ("stsc", s, e) =>
                            require(e - s >= 8, "stsc too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 12 * n, s"stsc table overruns: $n entries")
                            stscRuns = (0 until n.toInt).map(i =>
                              (be32(bytes, s + 8 + 12 * i), be32(bytes, s + 12 + 12 * i)))
                            stscRuns.zipWithIndex.foreach { case ((first, spc), i) =>
                              require(first >= 1 && spc >= 1,
                                s"stsc entry $i: first_chunk $first / samples_per_chunk $spc")
                              require(i == 0 || first > stscRuns(i - 1)._1,
                                s"stsc first_chunk not increasing at entry $i")
                            }
                          case ("stco", s, e) =>
                            require(e - s >= 8, "stco too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 4 * n, s"stco table overruns: $n entries")
                            chunkOffs = (0 until n.toInt).map(i => be32(bytes, s + 8 + 4 * i))
                          case ("co64", s, e) =>
                            require(e - s >= 8, "co64 too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 8 * n, s"co64 table overruns: $n entries")
                            chunkOffs = (0 until n.toInt).map { i =>
                              val o = be64(bytes, s + 8 + 8 * i)
                              // bound at parse time: a forged offset near
                              // Long.MaxValue would otherwise overflow the
                              // later off+sz range check into a negative
                              // (passing) sum — the range require below is
                              // also written overflow-free, but failing at
                              // the forged table is the louder message
                              require(o >= 0 && o <= bytes.length,
                                s"co64 offset $o at $i outside the ${bytes.length}-byte file")
                              o
                            }
                          case ("stss", s, e) =>
                            require(e - s >= 8, "stss too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 4 * n, s"stss table overruns: $n entries")
                            syncSet = Some((0 until n.toInt)
                              .map(i => be32(bytes, s + 8 + 4 * i)).toSet)
                          case ("ctts", s, e) =>
                            require(e - s >= 8, "ctts too short")
                            val n = be32(bytes, s + 4)
                            require(e - s >= 8 + 8 * n, s"ctts table overruns: $n entries")
                            // offsets are signed in v1, unsigned in v0; the
                            // signed read covers both at sane magnitudes
                            cttsRuns = (0 until n.toInt).map(i =>
                              (be32(bytes, s + 8 + 8 * i),
                                ByteBuffer.wrap(bytes, s + 12 + 8 * i, 4).getInt.toLong))
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            val nSamples = sizes.length
            if (nSamples > 0) {
              require(stscRuns.nonEmpty && chunkOffs.nonEmpty,
                s"track $trackId has ${nSamples} stsz samples but no stsc/stco tables")
              // dts per sample from the stts runs
              val dts = new Array[Long](nSamples)
              var di = 0; var t = 0L
              sttsRuns.foreach { case (count, delta) =>
                var c = 0L
                while (c < count && di < nSamples) {
                  dts(di) = t; t += delta; di += 1; c += 1
                }
              }
              require(di == nSamples,
                s"stts covers $di samples, stsz declares $nSamples (track $trackId)")
              // pts = dts + ctts composition offset (runs expand per sample;
              // a track without ctts presents in decode order)
              val pts = dts.clone()
              if (cttsRuns.nonEmpty) {
                var ci = 0
                cttsRuns.foreach { case (count, offset) =>
                  var c = 0L
                  while (c < count && ci < nSamples) {
                    pts(ci) = dts(ci) + offset; ci += 1; c += 1
                  }
                }
                require(ci == nSamples,
                  s"ctts covers $ci samples, stsz declares $nSamples (track $trackId)")
              }
              // expand chunks: stsc run k applies from its first_chunk up to
              // the next run's (exclusive)
              var si = 0
              var runIdx = 0
              var chunk = 1L // 1-based
              while (si < nSamples) {
                require(chunk <= chunkOffs.length,
                  s"track $trackId: chunk structure exhausts at sample $si/$nSamples")
                while (runIdx + 1 < stscRuns.length && stscRuns(runIdx + 1)._1 <= chunk)
                  runIdx += 1
                val spc = stscRuns(runIdx)._2
                var off = chunkOffs((chunk - 1).toInt)
                var j = 0L
                while (j < spc && si < nSamples) {
                  val sz = sizes(si)
                  // overflow-free form: `off + sz <= length` wraps negative
                  // (and passes) for a forged off near Long.MaxValue; every
                  // term here compares against the file length directly
                  require(off >= 0 && off <= bytes.length &&
                    sz >= 0 && sz <= bytes.length - off,
                    s"track $trackId sample $si range [$off, +$sz) " +
                      s"outside the ${bytes.length}-byte file")
                  out += Mp4Sample(trackId, si.toLong, off, sz, dts(si), pts(si),
                    isSync = syncSet.forall(_.contains(si + 1L)))
                  off += sz; si += 1; j += 1
                }
                chunk += 1
              }
            }
          case _ => ()
        }
      case _ => ()
    }
    Mp4SampleTable(out.toSeq, mdatStart)
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

  /** CRC-8 (poly 0x07, init 0) over `bytes[from, until)` — the checksum a
    * FLAC frame header carries over its own bytes. */
  def flacCrc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** FLAC's UTF-8-style coded number (frame/sample number): standard UTF-8
    * byte shapes extended past the Unicode range (up to 36 bits / 7 bytes). */
  private def flacUtf8Encode(n: Long): Array[Byte] = {
    require(n >= 0 && n < (1L << 36))
    if (n < 0x80) Array(n.toByte)
    else {
      // k continuation bytes carry 6 bits each; the lead byte carries
      // (6 - k) bits under a (k+1)-one prefix
      var k = 1
      while (k < 6 && n >= (1L << (6 - k + 6 * k))) k += 1
      val lead = (0xff << (7 - k)) & 0xff // k+1 ones then a zero
      val out = new Array[Byte](k + 1)
      out(0) = (lead | (n >>> (6 * k)).toInt).toByte
      var i = 1
      while (i <= k) {
        out(i) = (0x80 | ((n >>> (6 * (k - i))) & 0x3f).toInt).toByte
        i += 1
      }
      out
    }
  }

  /** Decode the coded number at `at`; returns (value, bytesConsumed). */
  private def flacUtf8Decode(bytes: Array[Byte], at: Int): (Long, Int) = {
    require(at < bytes.length, "coded number past end of file")
    val b0 = bytes(at) & 0xff
    if ((b0 & 0x80) == 0) (b0.toLong, 1)
    else {
      var k = 0
      var mask = 0x40
      while (k < 7 && (b0 & mask) != 0) { k += 1; mask >>= 1 }
      require(k >= 1 && k <= 6, s"malformed coded-number lead byte 0x${b0.toHexString}")
      require(at + k < bytes.length, "coded number truncated")
      var v = (b0 & (0x3f >> k)).toLong
      var i = 1
      while (i <= k) {
        val c = bytes(at + i) & 0xff
        require((c & 0xc0) == 0x80, s"malformed coded-number continuation at ${at + i}")
        v = (v << 6) | (c & 0x3f)
        i += 1
      }
      (v, k + 1)
    }
  }

  private def flacBlocksizeCode(blockSize: Int): Int = {
    require(blockSize >= 256 && blockSize <= 32768 &&
      Integer.bitCount(blockSize) == 1,
      s"encoder supports power-of-two block sizes 256..32768, got $blockSize")
    8 + Integer.numberOfTrailingZeros(blockSize) - 8 // 256<<(n-8) form
  }

  /** Encode a FLAC with REAL frame headers: `fLaC` + STREAMINFO (sole
    * metadata block, so the audio stream starts at byte 42), then one
    * fixed-blocksize frame per entry of `frameSizes` — sync 0xFF 0xF8,
    * blocksize code (256<<n form), rate/bits codes 0 (from STREAMINFO),
    * channel assignment, the UTF-8-coded frame number, CRC-8 over the
    * header — followed by that many filler payload bytes (closed-form
    * content, never 0xFF, so resync scans are unambiguous). Audio samples
    * are not encoded; the frame INDEX is the decode target. */
  def encodeFlacFrames(sampleRate: Int, channels: Int, bitsPerSample: Int,
                       blockSize: Int, frameSizes: Seq[Int],
                       seekEvery: Int = 0): Array[Byte] = {
    require(frameSizes.forall(_ >= 0))
    val totalSamples = blockSize.toLong * frameSizes.length
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 32)
    require(seekEvery >= 0)
    val bsCode = flacBlocksizeCode(blockSize)
    val withSeek = seekEvery > 0 && frameSizes.nonEmpty
    val head = ByteBuffer.allocate(4 + 4 + 34)
    head.put(asciiBytes("fLaC"))
    // STREAMINFO is last only when no SEEKTABLE follows
    head.put((if (withSeek) 0x00 else 0x80).toByte) // [last] | type 0
    head.put(0.toByte).put(0.toByte).put(34.toByte)
    head.putShort(blockSize.toShort).putShort(blockSize.toShort)
    head.put(new Array[Byte](6))
    head.putLong((sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples)
    head.put(new Array[Byte](16))
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.array(), 0, head.array().length)
    if (withSeek) {
      // SEEKTABLE (type 3, marked last): one 18-byte point per every
      // seekEvery-th frame — target sample number, byte offset FROM THE
      // FIRST FRAME, and the frame's sample count (spec layout)
      val points = frameSizes.indices.by(seekEvery)
      val st = ByteBuffer.allocate(4 + 18 * points.size)
      st.put(0x83.toByte)                  // LAST | type 3 = SEEKTABLE
      val len = 18 * points.size
      st.put(((len >> 16) & 0xff).toByte).put(((len >> 8) & 0xff).toByte)
        .put((len & 0xff).toByte)
      var byteOff = 0L
      var next = 0
      frameSizes.zipWithIndex.foreach { case (sz, i) =>
        if (next < points.size && i == points(next)) {
          st.putLong(blockSize.toLong * i)
          st.putLong(byteOff)
          st.putShort(blockSize.toShort)
          next += 1
        }
        byteOff += (4 + flacUtf8Encode(i.toLong).length + 1) + sz
      }
      out.write(st.array(), 0, st.array().length)
    }
    frameSizes.zipWithIndex.foreach { case (sz, i) =>
      val num = flacUtf8Encode(i.toLong)
      val hdr = new Array[Byte](4 + num.length + 1)
      hdr(0) = 0xff.toByte
      hdr(1) = 0xf8.toByte                 // sync + fixed-blocksize strategy
      hdr(2) = ((bsCode << 4) | 0).toByte  // rate code 0: from STREAMINFO
      hdr(3) = (((channels - 1) << 4) | 0).toByte // size code 0, reserved 0
      System.arraycopy(num, 0, hdr, 4, num.length)
      hdr(hdr.length - 1) = flacCrc8(hdr, 0, hdr.length - 1).toByte
      out.write(hdr, 0, hdr.length)
      var j = 0
      while (j < sz) { out.write((i * 13 + j) % 0x7f); j += 1 }
    }
    out.toByteArray
  }

  /** One SEEKTABLE point: target sample number, byte offset of its frame
    * header FROM THE FIRST FRAME (the spec's convention — add the
    * metadata-blocks length for an absolute position), and the frame's
    * sample count. Placeholder points (sample 0xFFFFFFFFFFFFFFFF) are
    * skipped. */
  final case class FlacSeekPoint(sampleNumber: Long, byteOffset: Long,
                                 frameSamples: Int)

  /** Decode the SEEKTABLE metadata block (type 3) — the audio seek index:
    * walk the metadata blocks like [[decodeFlac]], parse 18-byte points.
    * Returns empty when the file carries no SEEKTABLE. A seek consumer
    * cross-checks against [[flacFrameIndex]]: every point must land
    * exactly on an indexed frame (unit-pinned). */
  def decodeFlacSeekTable(bytes: Array[Byte]): Seq[FlacSeekPoint] = {
    decodeFlac(bytes) // validates magic + block walk bounds
    val out = scala.collection.mutable.ArrayBuffer[FlacSeekPoint]()
    var p = 4
    var last = false
    while (!last) {
      val hdr = bytes(p) & 0xff
      last = (hdr & 0x80) != 0
      val blockType = hdr & 0x7f
      val len = ((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff)
      if (blockType == 3) {
        require(len % 18 == 0, s"SEEKTABLE length $len not a multiple of 18")
        (0 until len / 18).foreach { i =>
          val at = p + 4 + 18 * i
          val sample = be64(bytes, at)
          if (sample != -1L) // 0xFFF...F = placeholder point
            out += FlacSeekPoint(sample, be64(bytes, at + 8),
              (((bytes(at + 16) & 0xff) << 8) | (bytes(at + 17) & 0xff)))
        }
      }
      p += 4 + len
    }
    out.toSeq
  }

  /** CRC-16 (poly 0x8005, init 0) — the checksum a FLAC frame carries over
    * its whole span (sync code through the last subframe's padding). */
  def flacCrc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** MSB-first bit writer (FLAC's bit order). */
  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nBits = 0
    def write(value: Long, bits: Int): Unit = {
      var b = bits - 1
      while (b >= 0) {
        cur = (cur << 1) | ((value >>> b) & 1L).toInt
        nBits += 1
        if (nBits == 8) { out.write(cur); cur = 0; nBits = 0 }
        b -= 1
      }
    }
    def padToByte(): Unit = if (nBits > 0) write(0L, 8 - nBits)
    def toBytes: Array[Byte] = { padToByte(); out.toByteArray }
  }

  /** MSB-first bit reader over `bytes[from, until)`, loud on exhaustion. */
  private final class BitReader(bytes: Array[Byte], from: Int, until: Int) {
    private var pos = from
    private var nBits = 0
    def read(bits: Int): Long = {
      var v = 0L
      var b = 0
      while (b < bits) {
        require(pos < until, s"bitstream exhausted at byte $pos")
        v = (v << 1) | ((bytes(pos) >> (7 - nBits)) & 1).toLong
        nBits += 1
        if (nBits == 8) { nBits = 0; pos += 1 }
        b += 1
      }
      v
    }
    def readSigned(bits: Int): Long = {
      val v = read(bits)
      if ((v & (1L << (bits - 1))) != 0) v - (1L << bits) else v
    }
    def alignToByte(): Int = { if (nBits > 0) { nBits = 0; pos += 1 }; pos }
  }

  /** Encode a FLAC whose frames carry REAL PCM in spec-true subframes —
    * VERBATIM (raw signed bps-bit samples) or, when a channel's block is
    * one repeated value, CONSTANT. Independent channel assignment, frame
    * footer CRC-16 over the whole frame, header CRC-8 as always. `samples`
    * is per frame, per channel, `blockSize` values each. With
    * `fixedOrder` 0-4, non-constant channels encode as FIXED-predictor
    * subframes: warm-up samples raw, order-k residuals rice-coded
    * (zigzag fold, unary quotient + `riceK` low bits) in
    * `2^partitionOrder` partitions — the spec's method-00 layout. With
    * `escapeBits` >= 0, every partition is ESCAPE-coded instead: the
    * parameter field carries the all-ones escape, 5 bits give n =
    * escapeBits, and the residuals follow as raw n-bit signed numbers.
    * The LAST frame may carry fewer than `blockSize` samples — it is
    * then headed with the inline 16-bit blocksize code (7), the way a
    * real fixed-blocksize stream ends mid-block. */
  def encodeFlacPcm(sampleRate: Int, channels: Int, bitsPerSample: Int,
                    blockSize: Int,
                    samples: Seq[Seq[Array[Int]]],
                    fixedOrder: Int = -1, riceK: Int = 6,
                    partitionOrder: Int = 0,
                    lpc: Option[(Seq[Int], Int, Int)] = None,
                    stereo: Int = -1,
                    escapeBits: Int = -1): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20))
    require(channels >= 1 && channels <= 8)
    require(bitsPerSample >= 4 && bitsPerSample <= 24)
    require(fixedOrder <= 4 && riceK >= 0 && riceK <= 14 && partitionOrder >= 0)
    require(escapeBits <= 31, s"escape n is a 5-bit field, got $escapeBits")
    val predOrder = lpc.map(_._1.size).getOrElse(math.max(fixedOrder, 0))
    if (fixedOrder >= 0 || lpc.isDefined) {
      require(blockSize % (1 << partitionOrder) == 0 &&
        (blockSize >> partitionOrder) > predOrder,
        s"partition order $partitionOrder does not divide $blockSize past order $predOrder")
    }
    lpc.foreach { case (coefs, shift, precision) =>
      require(coefs.nonEmpty && coefs.size <= 32, s"LPC order ${coefs.size}")
      require(shift >= 0 && shift <= 15 && precision >= 2 && precision <= 15)
      coefs.foreach(c => require(c >= -(1 << (precision - 1)) &&
        c < (1 << (precision - 1)), s"coef $c exceeds $precision-bit signed"))
    }
    require(stereo == -1 || (stereo >= 8 && stereo <= 10 && channels == 2),
      s"stereo decorrelation code $stereo needs exactly 2 channels")
    samples.zipWithIndex.foreach { case (fr, i) =>
      require(fr.size == channels, s"frame has ${fr.size} channels, want $channels")
      val frBs = fr.head.length
      fr.foreach(ch => require(ch.length == frBs,
        s"frame $i channels disagree on sample count"))
      require(frBs == blockSize ||
        (i == samples.size - 1 && frBs >= 1 && frBs < blockSize),
        s"frame $i carries $frBs samples, want $blockSize (only the last may be short)")
    }
    val bsCode = flacBlocksizeCode(blockSize)
    val totalSamples = samples.map(_.head.length.toLong).sum
    val head = ByteBuffer.allocate(4 + 4 + 34)
    head.put(asciiBytes("fLaC"))
    head.put(0x80.toByte)                  // LAST | type 0 = STREAMINFO
    head.put(0.toByte).put(0.toByte).put(34.toByte)
    head.putShort(blockSize.toShort).putShort(blockSize.toShort)
    head.put(new Array[Byte](6))
    head.putLong((sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      ((bitsPerSample - 1).toLong << 36) | totalSamples)
    head.put(new Array[Byte](16))
    val out = new java.io.ByteArrayOutputStream()
    out.write(head.array(), 0, head.array().length)
    samples.zipWithIndex.foreach { case (fr, i) =>
      val frBs = fr.head.length
      val shortFrame = frBs != blockSize
      val num = flacUtf8Encode(i.toLong)
      // a short (last) frame heads with the inline 16-bit blocksize code;
      // the inline value rides AFTER the coded frame number, per spec
      val inline: Array[Byte] =
        if (!shortFrame) Array.emptyByteArray
        else Array((((frBs - 1) >> 8) & 0xff).toByte, ((frBs - 1) & 0xff).toByte)
      val frameBsCode = if (shortFrame) 7 else bsCode
      val hdr = new Array[Byte](4 + num.length + inline.length + 1)
      hdr(0) = 0xff.toByte
      hdr(1) = 0xf8.toByte
      hdr(2) = ((frameBsCode << 4) | 0).toByte
      val chanCode = if (stereo >= 8) stereo else channels - 1
      hdr(3) = ((chanCode << 4) | 0).toByte
      System.arraycopy(num, 0, hdr, 4, num.length)
      System.arraycopy(inline, 0, hdr, 4 + num.length, inline.length)
      hdr(hdr.length - 1) = flacCrc8(hdr, 0, hdr.length - 1).toByte
      // stereo decorrelation transforms the two channels before subframe
      // coding; the side (difference) channel carries one extra bit
      val enc: Seq[(Array[Int], Int)] = stereo match {
        case 8 => // left/side
          val Seq(l, r) = fr
          Seq((l, bitsPerSample),
            (Array.tabulate(frBs)(j => l(j) - r(j)), bitsPerSample + 1))
        case 9 => // side/right (stored side first per spec)
          val Seq(l, r) = fr
          Seq((Array.tabulate(frBs)(j => l(j) - r(j)), bitsPerSample + 1),
            (r, bitsPerSample))
        case 10 => // mid/side
          val Seq(l, r) = fr
          Seq((Array.tabulate(frBs)(j => (l(j) + r(j)) >> 1), bitsPerSample),
            (Array.tabulate(frBs)(j => l(j) - r(j)), bitsPerSample + 1))
        case _ => fr.map(ch => (ch, bitsPerSample))
      }
      val bw = new BitWriter
      enc.foreach { case (ch, bps) =>
        def writeResiduals(order: Int, res: Seq[Long]): Unit = {
          bw.write(0L, 2)                          // rice, 4-bit params
          bw.write(partitionOrder.toLong, 4)
          require(frBs % (1 << partitionOrder) == 0,
            s"partition order $partitionOrder does not divide the $frBs-sample frame")
          val partSize = frBs >> partitionOrder
          var at = 0
          (0 until (1 << partitionOrder)).foreach { p =>
            val count = if (p == 0) partSize - order else partSize
            if (escapeBits >= 0) {
              // escape-coded partition: all-ones parameter, then 5-bit n,
              // then raw n-bit signed residuals (n = 0 writes nothing and
              // means all-zero — only valid if the residuals ARE zero)
              bw.write(0xfL, 4)
              bw.write(escapeBits.toLong, 5)
              res.slice(at, at + count).foreach { r =>
                if (escapeBits == 0) require(r == 0L,
                  s"escape n=0 encodes only zero residuals, got $r")
                else {
                  require(r >= -(1L << (escapeBits - 1)) &&
                    r < (1L << (escapeBits - 1)),
                    s"residual $r exceeds $escapeBits-bit signed")
                  bw.write(r & ((1L << escapeBits) - 1), escapeBits)
                }
              }
            } else {
              bw.write(riceK.toLong, 4)
              riceWrite(bw, res.slice(at, at + count), riceK)
            }
            at += count
          }
        }
        val constant = ch.forall(_ == ch(0))
        if (constant) {
          bw.write(0L, 1); bw.write(0L, 6); bw.write(0L, 1) // CONSTANT, no wasted bits
          bw.write(ch(0).toLong & ((1L << bps) - 1), bps)
        } else if (lpc.isDefined) {
          // LPC: warm-ups, 4-bit precision-1, 5-bit shift, order signed
          // precision-bit coefficients, then the shared residual layout
          val (coefs, shift, precision) = lpc.get
          val order = coefs.size
          bw.write(0L, 1); bw.write((32 + order - 1).toLong, 6); bw.write(0L, 1)
          (0 until order).foreach(j =>
            bw.write(ch(j).toLong & ((1L << bps) - 1), bps))
          bw.write((precision - 1).toLong, 4)
          bw.write(shift.toLong, 5)
          coefs.foreach(c => bw.write(c.toLong & ((1L << precision) - 1), precision))
          val res = (order until frBs).map { j =>
            val pred = coefs.zipWithIndex.map { case (c, t) =>
              c.toLong * ch(j - 1 - t) }.sum >> shift
            ch(j).toLong - pred
          }
          writeResiduals(order, res)
        } else if (fixedOrder >= 0) {
          // FIXED predictor: warm-up samples raw, then rice-coded residuals
          // in 2^partitionOrder partitions (method 00 = 4-bit rice params)
          bw.write(0L, 1); bw.write((8 + fixedOrder).toLong, 6); bw.write(0L, 1)
          val coefs = FixedCoefs(fixedOrder)
          (0 until fixedOrder).foreach(j =>
            bw.write(ch(j).toLong & ((1L << bps) - 1), bps))
          val res = (fixedOrder until frBs).map { j =>
            ch(j).toLong - coefs.zipWithIndex.map { case (c, t) =>
              c.toLong * ch(j - 1 - t) }.sum
          }
          writeResiduals(fixedOrder, res)
        } else {
          bw.write(0L, 1); bw.write(1L, 6); bw.write(0L, 1) // VERBATIM
          ch.foreach(s => bw.write(s.toLong & ((1L << bps) - 1), bps))
        }
      }
      val body = bw.toBytes // padded to byte
      val frame = new Array[Byte](hdr.length + body.length + 2)
      System.arraycopy(hdr, 0, frame, 0, hdr.length)
      System.arraycopy(body, 0, frame, hdr.length, body.length)
      val crc = flacCrc16(frame, 0, hdr.length + body.length)
      frame(frame.length - 2) = ((crc >> 8) & 0xff).toByte
      frame(frame.length - 1) = (crc & 0xff).toByte
      out.write(frame, 0, frame.length)
    }
    out.toByteArray
  }

  /** One decoded FLAC frame: its index, first-sample offset, and the PCM
    * samples per channel. */
  final case class FlacPcmFrame(frameIdx: Long, sampleOffset: Long,
                                channels: Seq[Array[Int]])

  /** FIXED-predictor coefficients by order: s[i] is predicted from the
    * previous `order` samples and the rice-coded residual corrects it
    * (order 0 = the residuals ARE the samples). */
  private val FixedCoefs: Array[Array[Int]] = Array(
    Array(), Array(1), Array(2, -1), Array(3, -3, 1), Array(4, -6, 4, -1))

  private def zigzag(r: Long): Long = (r << 1) ^ (r >> 63)
  private def unzigzag(u: Long): Long = (u >>> 1) ^ -(u & 1L)

  /** Rice-encode `residuals` into `bw`: unary quotient + k low bits over
    * the zigzag fold (the spec's mapping). */
  private def riceWrite(bw: BitWriter, residuals: Seq[Long], k: Int): Unit =
    residuals.foreach { r =>
      val u = zigzag(r)
      val q = u >>> k
      require(q < (1L << 20), s"residual $r needs a $q-bit unary quotient — raise k")
      var i = 0L
      while (i < q) { bw.write(0L, 1); i += 1 }
      bw.write(1L, 1)
      if (k > 0) bw.write(u & ((1L << k) - 1), k)
    }

  private def riceRead(br: BitReader, k: Int): Long = {
    var q = 0L
    while (br.read(1) == 0L) {
      q += 1
      require(q < (1L << 24), "runaway rice unary quotient (corrupt stream)")
    }
    val rem = if (k > 0) br.read(k) else 0L
    unzigzag((q << k) | rem)
  }

  /** REAL FLAC sample decode: walk frame headers (sync + CRC-8 like
    * [[flacFrameIndex]]), then decode each channel's subframe bit-exactly
    * — CONSTANT (one value), VERBATIM (raw signed bps-bit PCM), FIXED
    * orders 0-4, and LPC orders 1-32 (warm-ups + quantized coefficients +
    * rice-coded residuals in 2^p partitions, both 4- and 5-bit parameter
    * methods INCLUDING escape-coded (raw n-bit verbatim) partitions,
    * integrated through the predictor) — wasted-bits shifts and all three
    * stereo decorrelation modes honored — and validate the frame footer
    * CRC-16 over the whole frame. The remaining loud boundary is reserved
    * subframe/residual-method codes and variable-blocksize streams.
    * Unlike [[flacFrameIndex]]'s resync scan, this walk KNOWS each
    * frame's length (it decoded the bits), so it steps frame to frame
    * exactly. */
  def decodeFlacPcm(bytes: Array[Byte]): Seq[FlacPcmFrame] = {
    val si = decodeFlac(bytes)
    var p = 4
    var last = false
    while (!last) {
      last = (bytes(p) & 0x80) != 0
      p += 4 + (((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff))
    }
    require(si.minBlock == si.maxBlock,
      "PCM decode supports fixed-blocksize streams (STREAMINFO min != max)")
    val out = scala.collection.mutable.ArrayBuffer[FlacPcmFrame]()
    while (p < bytes.length) {
      val frameStart = p
      require(p + 5 <= bytes.length && (bytes(p) & 0xff) == 0xff &&
        (bytes(p + 1) & 0xfc) == 0xf8,
        s"expected a frame header at $p (PCM walk is exact, no resync)")
      val variable = (bytes(p + 1) & 0x01) != 0
      val bsCode = (bytes(p + 2) >>> 4) & 0xf
      val rateCode = bytes(p + 2) & 0xf
      val chanCode = (bytes(p + 3) >>> 4) & 0xf
      require(chanCode <= 10,
        s"reserved channel assignment code $chanCode at $p")
      // 0-7 = that many independent channels; 8/9/10 = stereo
      // decorrelation (left/side, side/right, mid/side) — two coded
      // channels, the side (difference) channel one bit wider
      val nCh = if (chanCode <= 7) chanCode + 1 else 2
      def sideBit(c: Int): Int = chanCode match {
        case 8 | 10 => if (c == 1) 1 else 0
        case 9 => if (c == 0) 1 else 0
        case _ => 0
      }
      val (num, numLen) = flacUtf8Decode(bytes, p + 4)
      var q = p + 4 + numLen
      // a truncated file must fail with the module's messaged require, not
      // a bare ArrayIndexOutOfBounds from the inline-field reads below
      // (headerAt in flacFrameIndex already had this bounds discipline)
      def needHdr(k: Int): Unit = require(q + k <= bytes.length,
        s"frame header at $frameStart truncated at byte $q")
      val blockSize = bsCode match {
        case 1 => 192
        case 6 => { needHdr(1); val v = (bytes(q) & 0xff) + 1; q += 1; v }
        case 7 => { needHdr(2); val v = (((bytes(q) & 0xff) << 8) | (bytes(q + 1) & 0xff)) + 1; q += 2; v }
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case n if n >= 8 => 256 << (n - 8)
        case _ => throw new IllegalArgumentException(s"reserved blocksize code at $p")
      }
      rateCode match {
        case 12 => q += 1
        case 13 | 14 => q += 2
        case _ => ()
      }
      needHdr(1)
      require(flacCrc8(bytes, frameStart, q) == (bytes(q) & 0xff),
        s"frame header CRC-8 mismatch at $frameStart")
      q += 1
      // subframes, bit-packed back to back
      val br = new BitReader(bytes, q, bytes.length)
      val coded = (0 until nCh).map { c =>
        require(br.read(1) == 0L, "subframe header pad bit must be 0")
        val tpe = br.read(6).toInt
        val wastedFlag = br.read(1)
        val wasted =
          if (wastedFlag == 0L) 0
          else { // unary-coded k-1: count zeros to the first 1, +1
            var k = 1
            while (br.read(1) == 0L) k += 1
            k
          }
        val bps = si.bitsPerSample + sideBit(c) - wasted
        require(bps >= 1, s"wasted bits $wasted exceed bits/sample")
        // shared residual layout (FIXED and LPC): rice partitions decoded
        // into s(order until blockSize)
        def readResiduals(s: Array[Long], order: Int): Unit = {
          val method = br.read(2)
          require(method <= 1L,
            s"reserved residual coding method $method at $frameStart")
          val paramBits = if (method == 0L) 4 else 5
          val escape = (1 << paramBits) - 1
          val pOrder = br.read(4).toInt
          require(blockSize % (1 << pOrder) == 0,
            s"partition order $pOrder does not divide block size $blockSize")
          val partSize = blockSize >> pOrder
          require(partSize > order,
            s"first partition underflows: 2^$pOrder partitions of $partSize " +
              s"vs predictor order $order")
          var at = order
          (0 until (1 << pOrder)).foreach { p =>
            val k = br.read(paramBits).toInt
            val count = if (p == 0) partSize - order else partSize
            if (k == escape) {
              // escape-coded partition: the 5 bits after the escape give n,
              // then the residuals are raw n-bit signed numbers (n = 0 means
              // every residual in the partition is zero — no bits follow)
              val n = br.read(5).toInt
              var i = 0
              while (i < count) {
                s(at) = if (n == 0) 0L else br.readSigned(n)
                at += 1; i += 1
              }
            } else {
              var i = 0
              while (i < count) { s(at) = riceRead(br, k); at += 1; i += 1 }
            }
          }
        }
        def shifted(s: Array[Long]): Array[Int] = {
          val out = new Array[Int](blockSize)
          var i = 0
          while (i < blockSize) { out(i) = (s(i) << wasted).toInt; i += 1 }
          out
        }
        val pcm = tpe match {
          case 0 => // CONSTANT
            val v = (br.readSigned(bps) << wasted).toInt
            Array.fill(blockSize)(v)
          case 1 => // VERBATIM
            Array.fill(blockSize)((br.readSigned(bps) << wasted).toInt)
          case t if t >= 8 && t <= 12 => // FIXED, order 0-4
            val order = t - 8
            require(order < blockSize, s"FIXED order $order >= block size $blockSize")
            val s = new Array[Long](blockSize)
            (0 until order).foreach(i => s(i) = br.readSigned(bps))
            readResiduals(s, order)
            val coefs = FixedCoefs(order)
            var i = order
            while (i < blockSize) {
              var pred = 0L
              var j = 0
              while (j < order) { pred += coefs(j) * s(i - 1 - j); j += 1 }
              s(i) += pred
              i += 1
            }
            shifted(s)
          case t if t >= 32 => // LPC, order 1-32
            val order = t - 32 + 1
            require(order < blockSize, s"LPC order $order >= block size $blockSize")
            val s = new Array[Long](blockSize)
            (0 until order).foreach(i => s(i) = br.readSigned(bps))
            val precision = br.read(4).toInt + 1
            require(precision <= 15, s"invalid qlp precision code at $frameStart")
            val shift = {
              // 5-bit SIGNED shift; the spec reserves negative values
              val v = br.read(5)
              val sv = if ((v & 0x10) != 0) v - 32 else v
              require(sv >= 0, s"negative LPC shift $sv is reserved")
              sv.toInt
            }
            val coefs = Array.fill(order)(br.readSigned(precision))
            readResiduals(s, order)
            var i = order
            while (i < blockSize) {
              var pred = 0L
              var j = 0
              while (j < order) { pred += coefs(j) * s(i - 1 - j); j += 1 }
              s(i) += (pred >> shift)
              i += 1
            }
            shifted(s)
          case t =>
            throw new IllegalArgumentException(
              s"reserved subframe type $t at $frameStart")
        }
        pcm
      }
      // undo stereo decorrelation into (left, right)
      val chans: Seq[Array[Int]] = chanCode match {
        case 8 => // left/side: R = L - side
          val Seq(l, side) = coded
          Seq(l, Array.tabulate(blockSize)(j => l(j) - side(j)))
        case 9 => // side/right: L = side + R
          val Seq(side, r) = coded
          Seq(Array.tabulate(blockSize)(j => side(j) + r(j)), r)
        case 10 => // mid/side: recover L/R from floor-mid + side parity
          val Seq(mid, side) = coded
          Seq(
            Array.tabulate(blockSize) { j =>
              (((mid(j).toLong << 1) | (side(j) & 1L)) + side(j)).toInt >> 1
            },
            Array.tabulate(blockSize) { j =>
              (((mid(j).toLong << 1) | (side(j) & 1L)) - side(j)).toInt >> 1
            })
        case _ => coded
      }
      val frameEnd = br.alignToByte()
      require(frameEnd + 2 <= bytes.length, s"frame at $frameStart truncated before CRC-16")
      val crc = flacCrc16(bytes, frameStart, frameEnd)
      val stored = ((bytes(frameEnd) & 0xff) << 8) | (bytes(frameEnd + 1) & 0xff)
      require(crc == stored,
        f"frame CRC-16 mismatch at $frameStart: computed $crc%04x stored $stored%04x")
      // fixed strategy: offset = frame number x the STREAM's constant block
      // size (STREAMINFO), not this frame's own — the LAST frame of a
      // fixed-blocksize stream may be shorter (inline code 6/7), and
      // num x shortBlock would misplace it
      val sampleOffset = if (variable) num else num * si.maxBlock
      out += FlacPcmFrame(out.size.toLong, sampleOffset, chans)
      p = frameEnd + 2
    }
    out.toSeq
  }

  /** One indexed frame: position in the frame sequence, the header's coded
    * frame number, its absolute byte offset, the first sample it carries,
    * its block size, and the parsed header's length (the frame's payload
    * starts at `byteOffset + headerLen`). */
  final case class FlacFrame(frameIdx: Long, frameNumber: Long,
                             byteOffset: Long, sampleOffset: Long,
                             blockSize: Int, headerLen: Int)

  /** Walk the frame headers to a frame index — the audio-side twin of the
    * MP4 sample-table walk: `(frame_idx, byte_offset, sample_offset)` rows
    * let a pipeline slice real frames without a codec. FLAC frames carry
    * no length field, so the walk is the resync scan real decoders use:
    * from the end of the metadata blocks, a frame starts wherever the
    * 14-bit sync code is followed by a header whose CRC-8 validates (a
    * random sync-shaped byte pair survives only with a matching CRC);
    * blocksize/rate/sample-size codes are decoded per spec (inline values
    * for codes 6/7 and 12-14, STREAMINFO fallbacks otherwise), the coded
    * number is the frame number (fixed strategy, sample offset = n x
    * block size) or the sample offset itself (variable strategy). */
  def flacFrameIndex(bytes: Array[Byte]): Seq[FlacFrame] = {
    val si = decodeFlac(bytes) // validates magic + blocks, gives fallbacks
    // end of metadata blocks (same walk decodeFlac performed)
    var p = 4
    var last = false
    while (!last) {
      last = (bytes(p) & 0x80) != 0
      p += 4 + (((bytes(p + 1) & 0xff) << 16) | ((bytes(p + 2) & 0xff) << 8) |
        (bytes(p + 3) & 0xff))
    }
    val out = scala.collection.mutable.ArrayBuffer[FlacFrame]()
    // try to parse a frame header at `at`; None = not a frame start
    def headerAt(at: Int): Option[(Long, Boolean, Int, Int)] = {
      if (at + 5 > bytes.length) return None
      if ((bytes(at) & 0xff) != 0xff || (bytes(at + 1) & 0xfc) != 0xf8) return None
      val variable = (bytes(at + 1) & 0x01) != 0
      val bsCode = (bytes(at + 2) >>> 4) & 0xf
      val rateCode = bytes(at + 2) & 0xf
      if (bsCode == 0 || rateCode == 15) return None // reserved/invalid
      if ((bytes(at + 3) & 0x01) != 0) return None   // reserved bit must be 0
      val (num, numLen) =
        try flacUtf8Decode(bytes, at + 4)
        catch { case _: IllegalArgumentException => return None }
      var q = at + 4 + numLen
      val blockSize = bsCode match {
        case 1 => 192
        case 6 => if (q + 1 > bytes.length) return None
          else { val v = (bytes(q) & 0xff) + 1; q += 1; v }
        case 7 => if (q + 2 > bytes.length) return None
          else { val v = (((bytes(q) & 0xff) << 8) | (bytes(q + 1) & 0xff)) + 1; q += 2; v }
        case n if n >= 2 && n <= 5 => 576 << (n - 2)
        case n => 256 << (n - 8)
      }
      rateCode match {
        case 12 => q += 1
        case 13 | 14 => q += 2
        case _ => ()
      }
      if (q + 1 > bytes.length) return None
      if (flacCrc8(bytes, at, q) != (bytes(q) & 0xff)) return None
      Some((num, variable, blockSize, q + 1 - at))
    }
    var idx = 0L
    while (p < bytes.length) {
      headerAt(p) match {
        case Some((num, variable, bs, hdrLen)) =>
          // fixed strategy: offset = frame number x the STREAM block size
          // (a fixed-blocksize stream's LAST frame may be shorter, coded
          // inline — multiplying by its own bs would misplace it). The
          // STREAMINFO constant is authoritative when it is known; a
          // degenerate header (maxBlock 0 = unknown) falls back to bs.
          val streamBs = if (si.maxBlock > 0) si.maxBlock else bs
          val sampleOffset = if (variable) num else num * streamBs
          out += FlacFrame(idx, num, p.toLong, sampleOffset, bs, hdrLen)
          idx += 1
          p += hdrLen
        case None =>
          require(out.nonEmpty,
            s"bytes after the metadata blocks at $p are not a valid frame header")
          p += 1 // resync scan between frames (no length field in FLAC)
      }
    }
    out.toSeq
  }
}
