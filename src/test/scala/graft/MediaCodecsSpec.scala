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
}
