package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MediaCodecs

/** The REAL media codecs: genuine container bytes in, structural parsing
  * out — including the tolerance/rejection behaviors a real reader needs
  * (unknown-chunk skipping, declared-offset honoring, tampered magic). */
class MediaCodecsSpec extends AnyFunSuite {

  test("WAV: encode/decode round-trip with exact integer features") {
    val samples = Array.tabulate(100)(i => (((7L * 31 + i * 17) % 2048) - 1024).toShort)
    val wav = MediaCodecs.encodeWavPcm16(8000, 1, samples)
    // canonical 44-byte header + data
    assert(wav.length === 44 + 200)
    assert(new String(wav.slice(0, 4), "US-ASCII") === "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") === "WAVE")
    val w = MediaCodecs.decodeWav(wav)
    assert(w.channels === 1 && w.sampleRate === 8000 && w.bitsPerSample === 16)
    assert(w.nSamples === 100)
    assert(w.durationMs === 100 * 1000L / 8000)
    assert(w.sumAbs === samples.map(s => math.abs(s.toLong)).sum)
    assert(w.peak === samples.map(s => math.abs(s.toInt)).max)
  }

  test("WAV: unknown chunks between fmt and data are skipped by length") {
    val samples = Array.tabulate(10)(i => (i * 100).toShort)
    val wav = MediaCodecs.encodeWavPcm16(44100, 2, samples)
    // splice a LIST metadata chunk (odd payload length to exercise the
    // word-alignment rule) between 'fmt ' (ends at 36) and 'data'
    val junk = "INFOgraft".getBytes("US-ASCII") // 9 bytes, odd
    val out = ByteBuffer.allocate(wav.length + 8 + junk.length + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(wav, 0, 36)
    out.put("LIST".getBytes("US-ASCII")).putInt(junk.length).put(junk)
    out.put(0.toByte) // alignment pad
    out.put(wav, 36, wav.length - 36)
    val spliced = out.array()
    // fix the RIFF size field (not load-bearing for our reader, but honest)
    ByteBuffer.wrap(spliced).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, spliced.length - 8)
    val w = MediaCodecs.decodeWav(spliced)
    assert(w.channels === 2 && w.sampleRate === 44100)
    assert(w.nSamples === 5) // 10 interleaved samples / 2 channels
  }

  test("WAV: tampered magic and non-PCM are rejected") {
    val wav = MediaCodecs.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val bad = wav.clone(); bad(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeWav(bad)).getMessage.contains("RIFF"))
    val nonPcm = wav.clone()
    ByteBuffer.wrap(nonPcm).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 3) // IEEE float
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeWav(nonPcm)).getMessage.contains("PCM"))
  }

  test("BMP: encode/decode round-trip honoring bottom-up rows and padding") {
    // width 5 => row stride 16 (15 data + 1 pad): padding must be skipped
    val w = 5; val h = 3
    def px(x: Int, y: Int) = ((x + 10 * y) % 256, (x + 10 * y + 1) % 256, (x + 10 * y + 2) % 256)
    val bmp = MediaCodecs.encodeBmp24(w, h, px)
    assert(bmp(0) === 'B'.toByte && bmp(1) === 'M'.toByte)
    assert(bmp.length === 54 + 16 * h)
    val b = MediaCodecs.decodeBmp(bmp)
    assert(b.width === w && b.height === h && b.bitsPerPixel === 24)
    val expect = for { y <- 0 until h; x <- 0 until w } yield px(x, y)
    assert(b.sumR === expect.map(_._1.toLong).sum)
    assert(b.sumG === expect.map(_._2.toLong).sum)
    assert(b.sumB === expect.map(_._3.toLong).sum)
  }

  test("BMP: declared pixel-array offset is honored (gap between headers and data)") {
    val bmp = MediaCodecs.encodeBmp24(2, 2, (x, y) => (x, y, x + y))
    val gap = 10
    val shifted = new Array[Byte](bmp.length + gap)
    System.arraycopy(bmp, 0, shifted, 0, 54)
    System.arraycopy(bmp, 54, shifted, 54 + gap, bmp.length - 54)
    ByteBuffer.wrap(shifted).order(ByteOrder.LITTLE_ENDIAN).putInt(10, 54 + gap)
    val b = MediaCodecs.decodeBmp(shifted)
    assert(b === MediaCodecs.decodeBmp(bmp))
  }

  test("BMP: non-BMP magic, wrong bpp, and overrunning pixel array are rejected") {
    val bmp = MediaCodecs.encodeBmp24(3, 3, (_, _) => (1, 2, 3))
    val bad = bmp.clone(); bad(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(bad)).getMessage.contains("BMP"))
    val bpp8 = bmp.clone()
    ByteBuffer.wrap(bpp8).order(ByteOrder.LITTLE_ENDIAN).putShort(28, 8)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(bpp8)).getMessage.contains("24-bit"))
    val truncated = java.util.Arrays.copyOf(bmp, bmp.length - 4)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeBmp(truncated)).getMessage.contains("overruns"))
  }

  test("synthetic fixture payloads decode to their closed forms") {
    // the generator arithmetic IS the oracle SQL — pin both ends here
    val id = 42L
    val w = MediaCodecs.decodeWav(Fixtures.syntheticWav(id))
    val n = 64 + id % 128
    assert(w.nSamples === n)
    assert(w.sumAbs === (0L until n).map(i => math.abs((id * 31 + i * 17) % 2048 - 1024)).sum)
    val b = MediaCodecs.decodeBmp(Fixtures.syntheticBmp(id))
    assert(b.width === 4 + id % 8)
    assert(b.height === 3 + id % 5)
    val ps = for { y <- 0L until b.height; x <- 0L until b.width } yield (id + 3 * x + 7 * y)
    assert(b.sumR === ps.map(_ % 256).sum)
    assert(b.sumG === ps.map(p => (p + 1) % 256).sum)
    assert(b.sumB === ps.map(p => (p + 2) % 256).sum)
    // PNG: lossless ⇒ the JDK ImageIO decode reproduces the generator
    val png = MediaCodecs.decodeImage(Fixtures.syntheticPng(id))
    assert(png.width === 5 + id % 7)
    assert(png.height === 4 + id % 6)
    val qs = for { y <- 0L until png.height; x <- 0L until png.width }
      yield (id * 5 + 2 * x + 11 * y)
    assert(png.sumR === qs.map(_ % 256).sum)
    assert(png.sumG === qs.map(p => (p + 3) % 256).sum)
    assert(png.sumB === qs.map(p => (p + 6) % 256).sum)
  }

  test("PNG: encode/decode round-trip is bit-exact for arbitrary rasters") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill(h, w)((rnd.nextInt(256), rnd.nextInt(256), rnd.nextInt(256)))
      val info = MediaCodecs.decodeImage(
        MediaCodecs.encodePng(w, h, (x, y) => px(y)(x)))
      assert(info.width == w && info.height == h)
      assert(info.sumR === px.flatten.map(_._1.toLong).sum)
      assert(info.sumG === px.flatten.map(_._2.toLong).sum)
      assert(info.sumB === px.flatten.map(_._3.toLong).sum)
    }
  }

  test("JPEG: JDK-bundled decode — exact dims, deterministic per JVM, lossy-close sums") {
    val w = 16; val h = 12
    def pixel(x: Int, y: Int) = { val v = (x * 13 + y * 29) % 256; (v, v, v) }
    val jpg = MediaCodecs.encodeJpeg(w, h, pixel)
    val a = MediaCodecs.decodeImage(jpg)
    assert(a.width == w && a.height == h)
    assert(a == MediaCodecs.decodeImage(jpg), "same-JVM decode must be deterministic")
    // lossy but bounded: mean absolute channel error under ~32/255
    val exact = (for { y <- 0 until h; x <- 0 until w } yield pixel(x, y)._1.toLong).sum
    assert(math.abs(a.sumR - exact) < 32L * w * h, s"sumR ${a.sumR} vs exact $exact")
  }

  test("decodeImage rejects bytes no JDK reader recognizes") {
    val e = intercept[IllegalArgumentException](
      MediaCodecs.decodeImage(Array.fill[Byte](64)(0x5a)))
    assert(e.getMessage.contains("ImageIO"))
  }

  // ------------------------------------------------------ MP4 (ISO-BMFF)

  test("MP4: encode/decode round-trip over the box tree") {
    val tracks = Seq(
      MediaCodecs.Mp4Track("vide", "avc1", 640, 480, 600L, 1800L, 90L),
      MediaCodecs.Mp4Track("soun", "mp4a", 0, 0, 48000L, 144000L, 141L))
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 1800L, tracks,
      mdat = Array[Byte](1, 2, 3, 4))
    assert(new String(mp4.slice(4, 8), "US-ASCII") === "ftyp")
    val m = MediaCodecs.decodeMp4(mp4)
    assert(m.brand === "isom")
    assert(m.timescale === 600L && m.duration === 1800L)
    assert(m.durationMs === 3000L) // 1800/600 s exactly
    assert(m.nTracks === 2)
    assert(m.width === 640 && m.height === 480)
    assert(m.codecs === Seq("avc1", "mp4a"))
    assert(m.nSamples === 90L + 141L)
    assert(m.audioRate === 48000L) // the audio trak's mdhd timescale
  }

  test("MP4: version-1 mvhd (64-bit duration) and unknown boxes are handled") {
    val mp4 = MediaCodecs.encodeMp4Meta("mp42", 1000L, 2500L,
      Seq(MediaCodecs.Mp4Track("vide", "hvc1", 320, 240, 1000L, 2500L, 75L)))
    // rewrite the mvhd in place as version 1: locate it, grow creation/
    // modification/duration to 64-bit (payload 96 -> 108)
    val moovAt = mp4.indexOfSlice("moov".getBytes("US-ASCII")) - 4
    val mvhdAt = mp4.indexOfSlice("mvhd".getBytes("US-ASCII")) - 4
    val oldMvhdLen = ByteBuffer.wrap(mp4, mvhdAt, 4).getInt
    val v1 = ByteBuffer.allocate(8 + 4 + 108)
    v1.putInt(8 + 4 + 108).put("mvhd".getBytes("US-ASCII"))
    v1.putInt(1 << 24)            // version 1
    v1.putLong(0).putLong(0)      // creation, modification (64-bit)
    v1.putInt(1000).putLong(2500) // timescale 32-bit, duration 64-bit
    v1.putInt(0x00010000).putShort(0x0100.toShort).putShort(0).putLong(0)
    (0 until 9).foreach(_ => v1.putInt(0)) // matrix (values unread)
    (0 until 6).foreach(_ => v1.putInt(0)) // pre_defined
    v1.putInt(2)
    val grown = v1.array().length - oldMvhdLen
    val out = ByteBuffer.allocate(mp4.length + grown + 12)
    out.put(mp4, 0, moovAt)
    out.putInt(ByteBuffer.wrap(mp4, moovAt, 4).getInt + grown + 12)
    out.put("moov".getBytes("US-ASCII"))
    // an unknown box inside moov, skipped by declared size
    out.putInt(12).put("skip".getBytes("US-ASCII")).putInt(0xdead)
    out.put(v1.array())
    out.put(mp4, mvhdAt + oldMvhdLen, mp4.length - mvhdAt - oldMvhdLen)
    val m = MediaCodecs.decodeMp4(out.array())
    assert(m.timescale === 1000L && m.duration === 2500L && m.durationMs === 2500L)
    assert(m.codecs === Seq("hvc1"))
  }

  test("MP4: version-1 tkhd (64-bit times) display dims parse at the v1 offsets") {
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 600L,
      Seq(MediaCodecs.Mp4Track("vide", "avc1", 256, 192, 600L, 600L, 30L)))
    val tkhdAt = mp4.indexOfSlice("tkhd".getBytes("US-ASCII")) - 4
    val oldLen = ByteBuffer.wrap(mp4, tkhdAt, 4).getInt
    // v1 payload: verflags + creation(8) + mod(8) + trackId + reserved +
    // duration(8) + reserved(8) + layer/alt/vol/res + matrix + dims = 96
    val v1 = ByteBuffer.allocate(8 + 96)
    v1.putInt(8 + 96).put("tkhd".getBytes("US-ASCII"))
    v1.putInt((1 << 24) | 7)
    v1.putLong(0).putLong(0)           // creation, modification
    v1.putInt(1).putInt(0)             // track_ID, reserved
    v1.putLong(600L)                   // duration (64-bit)
    v1.putLong(0)                      // reserved
    v1.putShort(0).putShort(0).putShort(0).putShort(0)
    (0 until 9).foreach(_ => v1.putInt(0))
    v1.putInt(256 << 16).putInt(192 << 16)
    val grown = (8 + 96) - oldLen
    val out = ByteBuffer.allocate(mp4.length + grown)
    out.put(mp4, 0, tkhdAt)
    out.put(v1.array())
    out.put(mp4, tkhdAt + oldLen, mp4.length - tkhdAt - oldLen)
    // grow every enclosing container size (moov, trak precede tkhd)
    val bytes = out.array()
    Seq("moov", "trak").foreach { b =>
      val at = bytes.indexOfSlice(b.getBytes("US-ASCII")) - 4
      ByteBuffer.wrap(bytes, at, 4).putInt(
        ByteBuffer.wrap(bytes, at, 4).getInt + grown)
    }
    val m = MediaCodecs.decodeMp4(bytes)
    assert(m.width === 256 && m.height === 192)
    assert(m.codecs === Seq("avc1"))
  }

  test("MP4: 64-bit largesize and to-end-of-file size forms are walked per spec") {
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 1200L,
      Seq(MediaCodecs.Mp4Track("vide", "av01", 128, 96, 600L, 1200L, 60L)),
      mdat = Array[Byte](9, 9, 9))
    // rewrite the trailing mdat in the spec's two alternate size forms
    val mdatAt = mp4.lastIndexOfSlice("mdat".getBytes("US-ASCII")) - 4
    val head = java.util.Arrays.copyOf(mp4, mdatAt)
    // form 1: size==1, 64-bit largesize follows the fourcc
    val large = ByteBuffer.allocate(16 + 3)
    large.putInt(1).put("mdat".getBytes("US-ASCII")).putLong(16 + 3)
    large.put(Array[Byte](9, 9, 9))
    val withLarge = head ++ large.array()
    assert(MediaCodecs.decodeMp4(withLarge) === MediaCodecs.decodeMp4(mp4))
    // form 2: size==0, box extends to the end of the file
    val toEnd = ByteBuffer.allocate(8 + 3)
    toEnd.putInt(0).put("mdat".getBytes("US-ASCII")).put(Array[Byte](9, 9, 9))
    assert(MediaCodecs.decodeMp4(head ++ toEnd.array()) === MediaCodecs.decodeMp4(mp4))
    // forged largesize past the file is loud
    val bad = withLarge.clone()
    ByteBuffer.wrap(bad, mdatAt + 8, 8).putLong(1L << 40)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(bad)).getMessage.contains("overruns"))
  }

  test("MP4: size-0 (to-end) form is refused inside an enclosing box") {
    // ISO 14496-12 §4.2 permits size==0 only for the LAST TOP-LEVEL box; a
    // corrupt inner box declaring it would silently swallow all remaining
    // siblings (e.g. later trak boxes) instead of failing loudly
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 1200L, Seq(
      MediaCodecs.Mp4Track("vide", "avc1", 64, 48, 600L, 1200L, 60L),
      MediaCodecs.Mp4Track("soun", "mp4a", 0, 0, 48000L, 96000L, 100L)))
    // forge the FIRST trak's size field to 0 (trak follows mvhd inside moov)
    val trakAt = mp4.indexOfSlice("trak".getBytes("US-ASCII")) - 4
    val bad = mp4.clone()
    java.nio.ByteBuffer.wrap(bad, trakAt, 4).putInt(0)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeMp4(bad))
    assert(e.getMessage.contains("top-level"), e.getMessage)
  }

  test("MP4 encode: values past the v0 u32 fields are refused, not truncated") {
    def track(samples: Long = 60L, mts: Long = 600L, mdur: Long = 1200L) =
      MediaCodecs.Mp4Track("vide", "avc1", 64, 48, mts, mdur, samples)
    // at the u32 ceiling round-trips exactly (be32 reads unsigned)
    val atMax = MediaCodecs.encodeMp4Meta("isom", 0xffffffffL, 0xffffffffL, Seq(track()))
    val m = MediaCodecs.decodeMp4(atMax)
    assert(m.timescale === 0xffffffffL && m.duration === 0xffffffffL)
    // one past it is loud (a silent .toInt would corrupt the round-trip)
    assert(intercept[IllegalArgumentException](MediaCodecs.encodeMp4Meta(
      "isom", 0x100000000L, 10L, Seq(track()))).getMessage.contains("timescale"))
    assert(intercept[IllegalArgumentException](MediaCodecs.encodeMp4Meta(
      "isom", 600L, 0x100000000L, Seq(track()))).getMessage.contains("duration"))
    assert(intercept[IllegalArgumentException](MediaCodecs.encodeMp4Meta(
      "isom", 600L, 10L, Seq(track(samples = 0x100000000L))))
      .getMessage.contains("sampleCount"))
    assert(intercept[IllegalArgumentException](MediaCodecs.encodeMp4Meta(
      "isom", 600L, 10L, Seq(track(mts = 0x100000000L))))
      .getMessage.contains("mediaTimescale"))
    assert(intercept[IllegalArgumentException](MediaCodecs.encodeMp4Meta(
      "isom", 600L, 10L, Seq(track(mdur = 0x100000000L))))
      .getMessage.contains("mediaDuration"))
  }

  test("MP4: a leading video track with 0x0 display dims IS the reported track") {
    // Mp4Info promises the FIRST video track's dims; keying on width == 0
    // used to skip a 0x0 leading track and misreport the second's
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 1200L, Seq(
      MediaCodecs.Mp4Track("vide", "avc1", 0, 0, 600L, 1200L, 60L),
      MediaCodecs.Mp4Track("vide", "av01", 256, 192, 600L, 1200L, 60L)))
    val m = MediaCodecs.decodeMp4(mp4)
    assert(m.width === 0 && m.height === 0,
      s"first video track declares 0x0; got ${m.width}x${m.height}")
    assert(m.codecs === Seq("avc1", "av01"))
  }

  test("MP4: truncated and forged boxes are rejected, never read wild") {
    val mp4 = MediaCodecs.encodeMp4Meta("isom", 600L, 600L,
      Seq(MediaCodecs.Mp4Track("vide", "avc1", 64, 48, 600L, 600L, 30L)))
    // not ISO-BMFF at all
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(Array.fill[Byte](32)(0x11))).getMessage.contains("ftyp"))
    // truncated mid-moov: some inner box's declared size overruns
    val cut = java.util.Arrays.copyOf(mp4, mp4.length / 2)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(cut)).getMessage.matches(".*(overruns|truncated).*"))
    // forged box size pointing past the enclosure
    val forged = mp4.clone()
    val trakAt = forged.indexOfSlice("trak".getBytes("US-ASCII")) - 4
    ByteBuffer.wrap(forged, trakAt, 4).putInt(1 << 30)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(forged)).getMessage.contains("overruns"))
    // forged stsz table count on the variable-size form
    val stszAt = forged.indexOfSlice("stsz".getBytes("US-ASCII")) - 4
    val fixed = mp4.clone()
    ByteBuffer.wrap(fixed, stszAt + 12, 8).putInt(0).putInt(1 << 20) // size=0, count huge
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(fixed)).getMessage.contains("stsz"))
    // a moov with no mvhd (zero timescale) is rejected
    val noMvhd = mp4.clone()
    val mvhdAt2 = noMvhd.indexOfSlice("mvhd".getBytes("US-ASCII"))
    System.arraycopy("free".getBytes("US-ASCII"), 0, noMvhd, mvhdAt2, 4)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeMp4(noMvhd)).getMessage.contains("mvhd"))
  }

  // ------------------------------------------------------------------ FLAC

  test("FLAC: encode/decode round-trip over STREAMINFO bit-fields") {
    val flac = MediaCodecs.encodeFlacMeta(44100, 2, 16, 441000L)
    assert(new String(flac.slice(0, 4), "US-ASCII") === "fLaC")
    val f = MediaCodecs.decodeFlac(flac)
    assert(f.sampleRate === 44100 && f.channels === 2 && f.bitsPerSample === 16)
    assert(f.totalSamples === 441000L)
    assert(f.durationMs === 10000L)
    assert(f.minBlock === 4096 && f.maxBlock === 4096)
    // edge values of the bit-packed fields survive the round trip
    val edge = MediaCodecs.decodeFlac(
      MediaCodecs.encodeFlacMeta(655349, 8, 32, (1L << 36) - 1))
    assert(edge.sampleRate === 655349 && edge.channels === 8 && edge.bitsPerSample === 32)
    assert(edge.totalSamples === (1L << 36) - 1)
  }

  test("FLAC: forged magic, misplaced STREAMINFO, overrunning lengths, bad sync rejected") {
    val flac = MediaCodecs.encodeFlacMeta(8000, 1, 8, 1000L)
    val bad = flac.clone(); bad(0) = 'X'.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(bad)).getMessage.contains("magic"))
    // first block forged to type 4 (VORBIS_COMMENT): spec mandates STREAMINFO first
    val misplaced = flac.clone(); misplaced(4) = 4.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(misplaced)).getMessage.contains("STREAMINFO"))
    // forged 24-bit block length overrunning the file
    val overrun = flac.clone(); overrun(5) = 0x7f.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(overrun)).getMessage.contains("overruns"))
    // truncated mid-STREAMINFO
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(java.util.Arrays.copyOf(flac, 20)))
      .getMessage.matches(".*(short|overruns).*"))
    // frame bytes after the metadata blocks must open with the sync code
    val badSync = flac.clone(); badSync(flac.length - 4) = 0x00.toByte
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(badSync)).getMessage.contains("sync"))
    // zero sample rate is meaningless (division guard)
    val zeroRate = flac.clone()
    ByteBuffer.wrap(zeroRate, 18, 8).putLong(0L)
    assert(intercept[IllegalArgumentException](
      MediaCodecs.decodeFlac(zeroRate)).getMessage.contains("rate"))
  }

  // --- adversarial-bytes fuzz (the TieredObjectFuzzSpec treatment): the
  // contract under corruption is reject LOUDLY (IllegalArgumentException /
  // bounded runtime exceptions) or parse a still-valid container — never an
  // Error (OOM from a forged length, stack overflow), never a wild read.

  private def fuzzSafely[A](decode: Array[Byte] => A)(bytes: Array[Byte]): Option[A] =
    try Some(decode(bytes))
    catch {
      case _: IllegalArgumentException => None
      case _: IndexOutOfBoundsException => None
      case _: java.nio.BufferUnderflowException => None
      case e: Throwable =>
        fail(s"decoder escaped the loud-rejection contract: ${e.getClass} ${e.getMessage}")
    }

  test("MP4/FLAC fuzz: random truncations never escape the loud-rejection contract") {
    val rnd = new scala.util.Random(4242)
    (1 to 300).foreach { _ =>
      val id = rnd.nextLong().abs % 1000
      val mp4 = Fixtures.syntheticMp4(id)
      fuzzSafely(MediaCodecs.decodeMp4)(
        java.util.Arrays.copyOf(mp4, 1 + rnd.nextInt(mp4.length - 1)))
      val flac = Fixtures.syntheticFlac(id)
      fuzzSafely(MediaCodecs.decodeFlac)(
        java.util.Arrays.copyOf(flac, 1 + rnd.nextInt(flac.length - 1)))
    }
  }

  test("MP4/FLAC fuzz: random byte corruption anywhere — loud or consistent, never wild") {
    val rnd = new scala.util.Random(777)
    (1 to 500).foreach { _ =>
      val id = rnd.nextLong().abs % 1000
      val mp4 = Fixtures.syntheticMp4(id)
      (1 to 3).foreach(_ => mp4(rnd.nextInt(mp4.length)) = rnd.nextInt(256).toByte)
      // a surviving parse must still respect the output invariants the
      // closed form guarantees structurally (never negative fields)
      fuzzSafely(MediaCodecs.decodeMp4)(mp4).foreach { m =>
        assert(m.nTracks >= 1 && m.timescale > 0 && m.nSamples >= 0)
      }
      val flac = Fixtures.syntheticFlac(id)
      (1 to 3).foreach(_ => flac(rnd.nextInt(flac.length)) = rnd.nextInt(256).toByte)
      fuzzSafely(MediaCodecs.decodeFlac)(flac).foreach { f =>
        assert(f.sampleRate > 0 && f.channels >= 1 && f.channels <= 8 &&
          f.bitsPerSample >= 1 && f.totalSamples >= 0)
      }
    }
  }

  test("MP4/FLAC fuzz: pure garbage and forged size fields never over-allocate or hang") {
    val rnd = new scala.util.Random(31337)
    (1 to 300).foreach { _ =>
      val garbage = Array.fill(8 + rnd.nextInt(256))(rnd.nextInt(256).toByte)
      fuzzSafely(MediaCodecs.decodeMp4)(garbage)
      fuzzSafely(MediaCodecs.decodeFlac)(garbage)
      // spliced: a valid prefix with forged 32-bit sizes at random 4-aligned
      // offsets — the classic parser trap (sizes pointing backwards, to 0,
      // past the file, or at Int.MaxValue)
      val mp4 = Fixtures.syntheticMp4(rnd.nextInt(500).toLong)
      val forged = mp4.clone()
      val at = (rnd.nextInt(forged.length / 4)) * 4
      val evil = Seq(0, 1, 2, 7, -1, Int.MaxValue, forged.length + 1)(rnd.nextInt(7))
      java.nio.ByteBuffer.wrap(forged, at, 4).putInt(evil)
      fuzzSafely(MediaCodecs.decodeMp4)(forged)
    }
  }

  test("synthetic MP4/FLAC fixture payloads decode to their closed forms") {
    (0L to 20L).foreach { id =>
      val m = MediaCodecs.decodeMp4(Fixtures.syntheticMp4(id))
      val k = 1 + id % 10
      assert(m.brand === "isom")
      assert(m.nTracks === 1 + id % 2)
      assert(m.width === 16 * (4 + id % 9) && m.height === 16 * (3 + id % 7))
      assert(m.durationMs === 1000 * k)
      assert(m.nSamples === 30 * k + (id % 2) * 48 * k)
      assert(m.audioRate === (if (id % 2 == 1) 48000L else 0L))
      assert(m.codecs === (if (id % 2 == 1) Seq("avc1", "mp4a") else Seq("avc1")))
      val f = MediaCodecs.decodeFlac(Fixtures.syntheticFlac(id))
      assert(f.sampleRate === 8000 + 4000 * (id % 3))
      assert(f.channels === 1 + id % 2)
      assert(f.bitsPerSample === 8 + 4 * (id % 3))
      assert(f.totalSamples === 1000 * (1 + id % 8))
      assert(f.durationMs === f.totalSamples * 1000 / f.sampleRate)
    }
  }

  test("MP4 sample table: resolved byte ranges land on the exact sample bytes") {
    // two tracks, short last chunks, both stco and co64 — and the proof is
    // ABSOLUTE: slicing the file at each resolved range must reproduce the
    // encoder's closed-form sample content byte for byte
    Seq(false, true).foreach { co64 =>
      val specs = Seq(
        MediaCodecs.Mp4SampleSpec(MediaCodecs.Mp4Track("vide", "avc1", 64, 48,
          600L, 500L, 5L), Seq(3, 1, 4, 1, 5), samplesPerChunk = 2),
        MediaCodecs.Mp4SampleSpec(MediaCodecs.Mp4Track("soun", "mp4a", 0, 0,
          48000L, 3072L, 3L), Seq(2, 6, 2), samplesPerChunk = 3))
      val mp4 = MediaCodecs.encodeMp4Samples("isom", 600L, 500L, specs, useCo64 = co64)
      val t = MediaCodecs.mp4SampleTable(mp4)
      assert(t.samples.size === 8)
      assert(t.mdatStart > 0 && t.mdatStart < mp4.length)
      // per-track shape: ids, indices, dts from the single stts run
      val v = t.samples.filter(_.trackId == 1)
      assert(v.map(_.sampleIdx) === Seq(0L, 1L, 2L, 3L, 4L))
      assert(v.map(_.size) === Seq(3L, 1L, 4L, 1L, 5L))
      assert(v.map(_.dts) === Seq(0L, 100L, 200L, 300L, 400L))
      val a = t.samples.filter(_.trackId == 2)
      assert(a.map(_.size) === Seq(2L, 6L, 2L))
      assert(a.map(_.dts) === Seq(0L, 1024L, 2048L))
      // spec defaults: no stss = all sync, no ctts = pts = dts
      assert(t.samples.forall(_.isSync))
      assert(t.samples.forall(s => s.pts == s.dts))
      // track-contiguous layout: video then audio, contiguous from mdatStart
      assert(t.samples.map(_.byteOffset).min === t.mdatStart)
      assert(v.head.byteOffset === t.mdatStart)
      assert(a.head.byteOffset === t.mdatStart + 14)
      // absolute correctness: the resolved range IS the sample's content
      t.samples.foreach { s =>
        val trackOrd = s.trackId - 1
        (0 until s.size.toInt).foreach { j =>
          assert(mp4((s.byteOffset + j).toInt) ===
            MediaCodecs.mp4SampleByte(trackOrd, s.sampleIdx.toInt, j),
            s"track ${s.trackId} sample ${s.sampleIdx} byte $j")
        }
      }
    }
  }

  test("MP4 sample table: stss keyframes and ctts composition offsets decode per spec") {
    // stss every 3rd sample (1-based 1, 4, 7); ctts offsets with real runs
    // (7,7,7,0,0,30,30) so the run-length compression round-trips
    val offs = Seq(7, 7, 7, 0, 0, 30, 30)
    val spec = MediaCodecs.Mp4SampleSpec(
      MediaCodecs.Mp4Track("vide", "avc1", 64, 48, 600L, 700L, 7L),
      Seq(2, 3, 2, 4, 1, 2, 3), samplesPerChunk = 3,
      syncEvery = 3, cttsOffsets = offs)
    val mp4 = MediaCodecs.encodeMp4Samples("isom", 600L, 700L, Seq(spec))
    // the ctts run table really is compressed (3 runs, not 7 entries)
    val cttsAt = mp4.indexOfSlice("ctts".getBytes("US-ASCII"))
    assert(cttsAt > 0)
    assert(ByteBuffer.wrap(mp4, cttsAt + 8, 4).getInt === 3)
    val t = MediaCodecs.mp4SampleTable(mp4)
    assert(t.samples.map(_.isSync) ===
      Seq(true, false, false, true, false, false, true))
    assert(t.samples.map(_.dts) === (0 until 7).map(_ * 100L))
    assert(t.samples.map(s => s.pts - s.dts) === offs.map(_.toLong))
    // forged ctts covering fewer samples than stsz is loud
    val bad = mp4.clone()
    ByteBuffer.wrap(bad, cttsAt + 8 + 4, 4).putInt(1) // first run count 3 -> 1
    val e = intercept[IllegalArgumentException](MediaCodecs.mp4SampleTable(bad))
    assert(e.getMessage.contains("ctts covers"), e.getMessage)
  }

  test("MP4 sample table: forged stsc/stco/stsz tables fail loudly, never read wild") {
    val rnd = new scala.util.Random(777)
    (1 to 200).foreach { _ =>
      val mp4 = Fixtures.syntheticMp4Samples(rnd.nextInt(500).toLong)
      // sanity: the honest file parses
      MediaCodecs.mp4SampleTable(mp4)
      val forged = mp4.clone()
      val at = (rnd.nextInt(forged.length / 4)) * 4
      val evil = Seq(0, 1, -1, Int.MaxValue, forged.length, 1 << 30)(rnd.nextInt(6))
      java.nio.ByteBuffer.wrap(forged, at, 4).putInt(evil)
      fuzzSafely(MediaCodecs.mp4SampleTable)(forged).foreach { t =>
        // a parse that survives the forgery must still be in-bounds
        t.samples.foreach(s =>
          assert(s.byteOffset >= 0 && s.byteOffset + s.size <= forged.length))
      }
      fuzzSafely(MediaCodecs.mp4SampleTable)(
        java.util.Arrays.copyOf(mp4, rnd.nextInt(mp4.length)))
    }
    // chunk structure that exhausts before the declared samples is loud
    val specs = Seq(MediaCodecs.Mp4SampleSpec(
      MediaCodecs.Mp4Track("vide", "avc1", 64, 48, 600L, 300L, 3L),
      Seq(2, 2, 2), samplesPerChunk = 3))
    val ok = MediaCodecs.encodeMp4Samples("isom", 600L, 300L, specs)
    // stsz count 3 -> forge to 9: more samples than the one chunk holds
    val stszAt = ok.indexOfSlice("stsz".getBytes("US-ASCII"))
    val bad = ok.clone()
    java.nio.ByteBuffer.wrap(bad, stszAt + 12, 4).putInt(9)
    val e = intercept[IllegalArgumentException](MediaCodecs.mp4SampleTable(bad))
    assert(e.getMessage.contains("overruns") || e.getMessage.contains("exhausts") ||
      e.getMessage.contains("covers"), e.getMessage)
    // a forged co64 offset near Long.MaxValue must fail LOUDLY at parse —
    // the naive `off + sz <= length` range check would Long-overflow to a
    // negative (passing) sum and emit samples with wild byte ranges
    val specs64 = Seq(MediaCodecs.Mp4SampleSpec(
      MediaCodecs.Mp4Track("vide", "avc1", 64, 48, 600L, 300L, 3L),
      Seq(2, 2, 2), samplesPerChunk = 3))
    val ok64 = MediaCodecs.encodeMp4Samples("isom", 600L, 300L, specs64,
      useCo64 = true)
    val co64At = ok64.indexOfSlice("co64".getBytes("US-ASCII"))
    assert(co64At > 0)
    val evil64 = ok64.clone()
    // fourcc(4) + version/flags(4) + entry_count(4) -> first 64-bit entry
    java.nio.ByteBuffer.wrap(evil64, co64At + 12, 8).putLong(Long.MaxValue - 1)
    val e64 = intercept[IllegalArgumentException](MediaCodecs.mp4SampleTable(evil64))
    assert(e64.getMessage.contains("co64 offset"), e64.getMessage)
  }

  test("FLAC frame index: offsets, sample offsets, multi-byte frame numbers, CRC resync") {
    val sizes = (0 until 140).map(i => 4 + (i % 9)) // crosses the 128 UTF-8 boundary
    val flac = MediaCodecs.encodeFlacFrames(16000, 2, 16, 4096, sizes)
    val idx = MediaCodecs.flacFrameIndex(flac)
    assert(idx.size === 140)
    // closed form while frame numbers fit one byte (header = 6 bytes)...
    var off = 42L
    (0 until 128).foreach { i =>
      assert(idx(i).byteOffset === off, s"frame $i")
      assert(idx(i).frameNumber === i.toLong)
      assert(idx(i).sampleOffset === 4096L * i)
      assert(idx(i).blockSize === 4096)
      off += 6 + sizes(i)
    }
    // ...then 7-byte headers (2-byte UTF-8 coded numbers)
    (128 until 140).foreach { i =>
      assert(idx(i).byteOffset === off, s"frame $i")
      assert(idx(i).sampleOffset === 4096L * i)
      off += 7 + sizes(i)
    }
    assert(off === flac.length.toLong)
    // payload slicing (header end -> next sync) reproduces the encoder's
    // closed-form content byte for byte — what Multimodal.flacFrameSlices cuts
    idx.zipWithIndex.foreach { case (f, i) =>
      val start = (f.byteOffset + f.headerLen).toInt
      val end = if (i + 1 < idx.size) idx(i + 1).byteOffset.toInt else flac.length
      assert(end - start === sizes(i), s"frame $i payload length")
      (start until end).foreach(p =>
        assert(flac(p) === ((i * 13 + (p - start)) % 0x7f).toByte))
    }
    // a corrupted header CRC drops exactly that frame (resync finds the next)
    val bad = flac.clone()
    bad(idx(5).byteOffset.toInt + 2) = 0x10.toByte // blocksize code 1 = 192: CRC now wrong
    val re = MediaCodecs.flacFrameIndex(bad)
    assert(re.size === 139 && !re.exists(_.frameNumber == 5L))
    // garbage and truncations stay inside the loud-rejection contract
    val rnd = new scala.util.Random(9999)
    (1 to 200).foreach { _ =>
      fuzzSafely(MediaCodecs.flacFrameIndex)(
        Array.fill(8 + rnd.nextInt(200))(rnd.nextInt(256).toByte))
      fuzzSafely(MediaCodecs.flacFrameIndex)(
        java.util.Arrays.copyOf(flac, rnd.nextInt(flac.length)))
      val forged = flac.clone()
      forged(rnd.nextInt(forged.length)) = rnd.nextInt(256).toByte
      fuzzSafely(MediaCodecs.flacFrameIndex)(forged)
    }
  }

  test("FLAC seek table: points land exactly on indexed frames; frames-only files have none") {
    (0L to 25L).foreach { id =>
      val flac = Fixtures.syntheticFlacSeekable(id)
      val points = MediaCodecs.decodeFlacSeekTable(flac)
      val idx = MediaCodecs.flacFrameIndex(flac)
      val n = (4 + id % 5).toInt
      assert(idx.size === n, s"id $id")
      assert(points.size === (n + 1) / 2, s"id $id")
      // spec convention: point byte offsets are FROM THE FIRST FRAME; the
      // first frame's absolute offset is the metadata-blocks length
      val firstFrame = idx.head.byteOffset
      assert(firstFrame === 42L + 4L + 18L * points.size, s"id $id")
      points.zipWithIndex.foreach { case (pt, k) =>
        val frame = idx(2 * k)
        assert(pt.sampleNumber === frame.sampleOffset, s"id $id point $k")
        assert(firstFrame + pt.byteOffset === frame.byteOffset, s"id $id point $k")
        assert(pt.frameSamples === frame.blockSize, s"id $id point $k")
      }
    }
    // a file without a SEEKTABLE block decodes to an empty seq, loudly not wrongly
    assert(MediaCodecs.decodeFlacSeekTable(Fixtures.syntheticFlacFrames(3L)).isEmpty)
    // placeholder points (sample 0xFF..F) are skipped per spec
    val flac = Fixtures.syntheticFlacSeekable(0L)
    val forged = flac.clone()
    // first point's sample number -> placeholder
    java.nio.ByteBuffer.wrap(forged, 42 + 4, 8).putLong(-1L)
    assert(MediaCodecs.decodeFlacSeekTable(forged).size ===
      MediaCodecs.decodeFlacSeekTable(flac).size - 1)
    // corrupted SEEKTABLE length (not a multiple of 18) is loud
    val bad = flac.clone()
    bad(42 + 3) = (bad(42 + 3) + 1).toByte
    intercept[IllegalArgumentException](MediaCodecs.decodeFlacSeekTable(bad))
  }

  test("FLAC PCM: CONSTANT/VERBATIM subframes round-trip bit-exactly, CRC-16 enforced") {
    // 2 channels, NEGATIVE samples included (sign extension), one channel
    // constant (CONSTANT subframe) — exact PCM equality
    val f0 = Seq(
      Array.tabulate(256)(i => ((i * 37) % 401) - 200), // verbatim, signed
      Array.fill(256)(-7))                              // constant
    val f1 = Seq(
      Array.tabulate(256)(i => ((i * 91) % 129) - 64),
      Array.tabulate(256)(i => if (i % 2 == 0) 1000 else -1000))
    val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(f0, f1))
    val frames = MediaCodecs.decodeFlacPcm(flac)
    assert(frames.size === 2)
    assert(frames(0).sampleOffset === 0L && frames(1).sampleOffset === 256L)
    frames.zip(Seq(f0, f1)).foreach { case (got, want) =>
      got.channels.zip(want).foreach { case (g, w) => assert(g.toSeq === w.toSeq) }
    }
    // STREAMINFO agrees with the frame walk
    val si = MediaCodecs.decodeFlac(flac)
    assert(si.totalSamples === 512L && si.channels === 2)
    // the generic frame index walks the same file (real subframe bytes)
    assert(MediaCodecs.flacFrameIndex(flac).size === 2)
    // a flipped PCM bit is caught by the frame CRC-16
    val bad = flac.clone()
    val payloadAt = MediaCodecs.flacFrameIndex(flac).head.byteOffset.toInt + 8
    bad(payloadAt) = (bad(payloadAt) ^ 0x04).toByte
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeFlacPcm(bad))
    assert(e.getMessage.contains("CRC-16"), e.getMessage)
  }

  test("FLAC PCM: non-byte-aligned bits-per-sample and the codec boundary") {
    // bps 12: subframes are NOT byte-aligned — exercises the bit reader's
    // cross-byte path; values span the signed 12-bit range
    val ch = Array.tabulate(256)(i => ((i * 53) % 4001) - 2000)
    val flac = MediaCodecs.encodeFlacPcm(8000, 1, 12, 256, Seq(Seq(ch)))
    val frames = MediaCodecs.decodeFlacPcm(flac)
    assert(frames.head.channels.head.toSeq === ch.toSeq)
    // a RESERVED subframe type is a loud boundary, not a wrong answer
    val forged = flac.clone()
    val subframeAt = MediaCodecs.flacFrameIndex(flac).head.byteOffset.toInt + 6
    forged(subframeAt) = 0x04.toByte // type 000010 = reserved
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeFlacPcm(forged))
    assert(e.getMessage.contains("reserved subframe"), e.getMessage)
    // reserved channel assignment codes are likewise loud
    val fl2 = MediaCodecs.encodeFlacPcm(8000, 2, 16, 256,
      Seq(Seq(Array.fill(256)(1), Array.fill(256)(2))))
    val forged2 = fl2.clone()
    val hdrAt = MediaCodecs.flacFrameIndex(fl2).head.byteOffset.toInt
    forged2(hdrAt + 3) = 0xb0.toByte // channel code 11 = reserved
    // header CRC-8 must be refreshed for the forged byte to reach the check
    forged2(hdrAt + 5) = MediaCodecs.flacCrc8(forged2, hdrAt, hdrAt + 5).toByte
    val e2 = intercept[IllegalArgumentException](MediaCodecs.decodeFlacPcm(forged2))
    assert(e2.getMessage.contains("reserved channel"), e2.getMessage)
    // fuzz: garbage/truncation stays inside the loud-rejection contract
    val rnd = new scala.util.Random(2024)
    (1 to 150).foreach { _ =>
      fuzzSafely(MediaCodecs.decodeFlacPcm)(
        Array.fill(8 + rnd.nextInt(200))(rnd.nextInt(256).toByte))
      fuzzSafely(MediaCodecs.decodeFlacPcm)(
        java.util.Arrays.copyOf(flac, rnd.nextInt(flac.length)))
      val t = flac.clone(); t(rnd.nextInt(t.length)) = rnd.nextInt(256).toByte
      fuzzSafely(MediaCodecs.decodeFlacPcm)(t)
    }
  }

  test("FLAC PCM: FIXED predictors round-trip bit-exactly, all orders and partitions") {
    // every FIXED order x several partition orders, negative samples, two
    // channels — rice-coded residuals must integrate back to exact PCM
    val ch0 = Array.tabulate(256)(i => ((i * 37) % 401) - 200)
    val ch1 = Array.tabulate(256)(i => ((i * i) % 257) - 128) // quadratic: order-2 friendly
    (0 to 4).foreach { order =>
      Seq(0, 1, 3).foreach { pOrder =>
        val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256,
          Seq(Seq(ch0, ch1)), fixedOrder = order, riceK = 8,
          partitionOrder = pOrder)
        val frames = MediaCodecs.decodeFlacPcm(flac)
        assert(frames.head.channels(0).toSeq === ch0.toSeq, s"o=$order p=$pOrder")
        assert(frames.head.channels(1).toSeq === ch1.toSeq, s"o=$order p=$pOrder")
      }
    }
    // FIXED is materially smaller than VERBATIM on smooth content — proves
    // the residual path actually rice-codes rather than storing raw
    val smooth = Array.tabulate(256)(i => 1000 + i * 3)
    val fixed2 = MediaCodecs.encodeFlacPcm(16000, 1, 16, 256,
      Seq(Seq(smooth)), fixedOrder = 2, riceK = 2)
    val verbatim = MediaCodecs.encodeFlacPcm(16000, 1, 16, 256, Seq(Seq(smooth)))
    assert(fixed2.length < verbatim.length / 3,
      s"fixed ${fixed2.length} vs verbatim ${verbatim.length}")
    // ESCAPE-coded (raw n-bit verbatim) partitions round-trip bit-exactly —
    // the one residual layout that used to be a loud boundary, now decoded:
    // param = all-ones, 5-bit n, then raw n-bit signed residuals
    (0 to 4).foreach { order =>
      Seq(0, 2).foreach { pOrder =>
        Seq(13, 15).foreach { nBits => // order-4 residuals reach ~±3200
          val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256,
            Seq(Seq(ch0, ch1)), fixedOrder = order, partitionOrder = pOrder,
            escapeBits = nBits)
          val frames = MediaCodecs.decodeFlacPcm(flac)
          assert(frames.head.channels(0).toSeq === ch0.toSeq,
            s"escape o=$order p=$pOrder n=$nBits")
          assert(frames.head.channels(1).toSeq === ch1.toSeq,
            s"escape o=$order p=$pOrder n=$nBits")
        }
      }
    }
    // escape composes with LPC and with stereo decorrelation
    val l = ch0; val r = Array.tabulate(256)(i => ((i * 53) % 337) - 168)
    Seq(8, 9, 10).foreach { mode =>
      val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, r)),
        stereo = mode, lpc = Some((Seq(2, -1), 0, 5)), escapeBits = 12)
      val got = MediaCodecs.decodeFlacPcm(flac).head.channels
      assert(got(0).toSeq === l.toSeq, s"escape+lpc stereo $mode")
      assert(got(1).toSeq === r.toSeq, s"escape+lpc stereo $mode")
    }
    // escape n=0 means an all-zero partition with NO residual bits: a
    // constant-slope ramp has exactly zero order-1... order-2 residuals
    val ramp = Array.tabulate(256)(i => 100 + 5 * i)
    val z = MediaCodecs.encodeFlacPcm(16000, 1, 16, 256, Seq(Seq(ramp)),
      fixedOrder = 2, escapeBits = 0)
    assert(MediaCodecs.decodeFlacPcm(z).head.channels.head.toSeq === ramp.toSeq)
    // ... and is materially smaller than verbatim (no bits per residual)
    val zv = MediaCodecs.encodeFlacPcm(16000, 1, 16, 256, Seq(Seq(ramp)))
    assert(z.length < zv.length / 4, s"escape0 ${z.length} vs verbatim ${zv.length}")
  }

  test("FLAC PCM: short inline-blocksize last frame decodes at the right offsets") {
    // a fixed-blocksize stream whose LAST frame is short (inline code 7):
    // both walks must place it at frameNumber x the STREAM block size, not
    // frameNumber x its own short size
    val full = Array.tabulate(256)(i => ((i * 37) % 401) - 200)
    val tail = Array.tabulate(192)(i => ((i * 91) % 129) - 64)
    Seq(-1, 2).foreach { order => // verbatim and FIXED paths both
      val flac = MediaCodecs.encodeFlacPcm(16000, 1, 16, 256,
        Seq(Seq(full), Seq(full), Seq(tail)), fixedOrder = order, riceK = 8)
      assert(MediaCodecs.decodeFlac(flac).totalSamples === 704L)
      val frames = MediaCodecs.decodeFlacPcm(flac)
      assert(frames.map(_.sampleOffset) === Seq(0L, 256L, 512L), s"order $order")
      assert(frames(2).channels.head.toSeq === tail.toSeq, s"order $order")
      // the resync-scan index agrees: last frame at 2 x 256, NOT 2 x 192
      val idx = MediaCodecs.flacFrameIndex(flac)
      assert(idx.map(_.sampleOffset) === Seq(0L, 256L, 512L), s"order $order")
      assert(idx(2).blockSize === 192, s"order $order")
    }
  }

  test("FLAC PCM: LPC subframes and stereo decorrelation round-trip bit-exactly") {
    val l = Array.tabulate(256)(i => ((i * 37) % 401) - 200)
    val r = Array.tabulate(256)(i => ((i * 53) % 337) - 168)
    // LPC at several orders/shifts/precisions, independent channels
    Seq((Seq(1), 0, 4), (Seq(2, -1), 0, 5), (Seq(3, -3, 1), 1, 6),
        (Seq(5, -4, 2, -1, 1, -1, 2, 1), 2, 7)).foreach { case (coefs, shift, prec) =>
      val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, r)),
        lpc = Some((coefs, shift, prec)), riceK = 9, partitionOrder = 1)
      val got = MediaCodecs.decodeFlacPcm(flac).head.channels
      assert(got(0).toSeq === l.toSeq, s"lpc $coefs shift $shift")
      assert(got(1).toSeq === r.toSeq, s"lpc $coefs shift $shift")
    }
    // all three stereo decorrelation modes (odd L+R sums exercise the
    // mid/side parity bit; negatives exercise the side channel's sign)
    Seq(8, 9, 10).foreach { mode =>
      val flac = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, r)),
        stereo = mode)
      val got = MediaCodecs.decodeFlacPcm(flac).head.channels
      assert(got(0).toSeq === l.toSeq, s"stereo mode $mode")
      assert(got(1).toSeq === r.toSeq, s"stereo mode $mode")
      // decorrelation + FIXED residual coding compose
      val flac2 = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, r)),
        stereo = mode, fixedOrder = 2, riceK = 9)
      assert(MediaCodecs.decodeFlacPcm(flac2).head.channels(1).toSeq === r.toSeq)
      // ... and + LPC
      val flac3 = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, r)),
        stereo = mode, lpc = Some((Seq(2, -1), 0, 5)), riceK = 9)
      assert(MediaCodecs.decodeFlacPcm(flac3).head.channels(0).toSeq === l.toSeq)
    }
    // mid/side is genuinely smaller than independent on correlated stereo
    val corr = Array.tabulate(256)(i => l(i) + 3)
    val ms = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, corr)),
      stereo = 10, fixedOrder = 1, riceK = 7)
    val ind = MediaCodecs.encodeFlacPcm(16000, 2, 16, 256, Seq(Seq(l, corr)))
    assert(ms.length < ind.length / 2, s"ms ${ms.length} vs ind ${ind.length}")
  }

  test("FLAC PCM: fixture closed form across ids") {
    // 0-20 covers every layout arm: VERBATIM/FIXED/LPC, all stereo modes,
    // escape-coded partitions (ids 7, 17) and the short 192-sample last
    // frame (ids with id mod 5 = 4)
    (0L to 20L).foreach { id =>
      val nFrames = (2 + id % 3).toInt
      val frames = MediaCodecs.decodeFlacPcm(Fixtures.syntheticFlacPcm(id))
      assert(frames.size === nFrames, s"id $id")
      frames.zipWithIndex.foreach { case (fr, f) =>
        assert(fr.sampleOffset === 256L * f, s"id $id f $f")
        assert(fr.channels.size === (1 + id % 2).toInt)
        val bs = if (id % 5 == 4 && f == nFrames - 1) 192 else 256
        fr.channels.zipWithIndex.foreach { case (pcm, c) =>
          assert(pcm.length === bs, s"id $id f $f c $c")
          (0 until bs).foreach { i =>
            val want =
              if ((id + f + c) % 4 == 0) (id % 121).toInt
              else ((id * 7 + f * 131 + c * 17 + i * 29) % 121).toInt
            assert(pcm(i) === want, s"id $id f $f c $c i $i")
          }
        }
      }
    }
  }

  test("FLAC frame index: fixture closed form across ids") {
    (0L to 30L).foreach { id =>
      val idx = MediaCodecs.flacFrameIndex(Fixtures.syntheticFlacFrames(id))
      val n = (3 + id % 6).toInt
      assert(idx.size === n, s"id $id")
      var off = 42L
      (0 until n).foreach { i =>
        assert(idx(i).byteOffset === off, s"id $id frame $i")
        assert(idx(i).sampleOffset === 4096L * i)
        off += 6 + 4 + ((id + i) % 9)
      }
    }
  }
}
