package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{FlatRecordBatch, RecordBatchRow, TieredObject}

/** Adversarial-bytes fuzzing of the tiered-object decoder — the same
  * treatment the WAL codec's torn-tail property test gives WAL segments.
  * The contract under corruption: reject LOUDLY (IllegalArgumentException /
  * bounded runtime exceptions) or parse a clean prefix — never an Error
  * (OOM from a forged 2 GB length field, stack overflow), never a silent
  * wrong answer, never an allocation proportional to a DECLARED length the
  * buffer cannot hold. */
class TieredObjectFuzzSpec extends AnyFunSuite {

  private def validObject(rnd: scala.util.Random, n: Int): (Array[Byte], Long) = {
    val start = rnd.nextInt(10000).toLong
    val frames = (0 until n).map { i =>
      FlatRecordBatch.encode(RecordBatchRow(7L, 0, 0, start + i, 1,
        1000L + i, if (i % 3 == 0) Map("k" -> ("v" * (i % 7))) else Map.empty,
        Array.fill(1 + rnd.nextInt(200))(rnd.nextInt().toByte)))
    }
    val (bytes, _) = TieredObject.encode(frames, start, sparseBytes = 128)
    (bytes, start)
  }

  /** Decode must either succeed or throw a non-Error exception; it must
    * never allocate unboundedly (enforced by running inside the test JVM's
    * normal heap — a forged 2 GB field would OOM the suite). */
  private def decodesSafely(bytes: Array[Byte], start: Long): Option[Int] =
    try Some(TieredObject.decodeAll(bytes, start).size)
    catch {
      case _: IllegalArgumentException => None
      case _: IndexOutOfBoundsException => None
      case _: java.nio.BufferUnderflowException => None
      case e: Throwable =>
        fail(s"decoder escaped the loud-rejection contract: ${e.getClass} ${e.getMessage}")
    }

  test("random truncations: clean prefix or loud rejection, never a wrong answer") {
    val rnd = new scala.util.Random(1234)
    (1 to 200).foreach { trial =>
      val (bytes, start) = validObject(rnd, 1 + rnd.nextInt(12))
      val full = TieredObject.decodeAll(bytes, start)
      val cut = 1 + rnd.nextInt(bytes.length - 1)
      decodesSafely(java.util.Arrays.copyOf(bytes, cut), start).foreach { got =>
        // a truncated object that still parses must have a VALID footer by
        // luck — then every decoded row must be a prefix of the real rows
        val rows = TieredObject.decodeAll(java.util.Arrays.copyOf(bytes, cut), start)
        assert(rows.zip(full).forall { case (a, b) => a.base_offset == b.base_offset },
          s"trial $trial cut $cut returned non-prefix rows")
        assert(got <= full.size)
      }
    }
  }

  test("random single-byte corruption anywhere: never an Error, never over-allocation") {
    val rnd = new scala.util.Random(99)
    (1 to 300).foreach { _ =>
      val (bytes, start) = validObject(rnd, 1 + rnd.nextInt(8))
      val mutated = bytes.clone()
      val at = rnd.nextInt(mutated.length)
      mutated(at) = (mutated(at) ^ (1 << rnd.nextInt(8))).toByte
      decodesSafely(mutated, start) // contract enforced inside
    }
  }

  test("forged footer fields: huge/negative indexPos and indexLen reject loudly") {
    val rnd = new scala.util.Random(5)
    val (bytes, start) = validObject(rnd, 4)
    def withFooterInts(indexPos: Int, indexLen: Int): Array[Byte] = {
      val b = bytes.clone()
      val fb = b.length - TieredObject.FooterLen
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.BIG_ENDIAN)
      bb.putInt(fb, indexPos); bb.putInt(fb + 4, indexLen)
      b
    }
    Seq((Int.MaxValue, 4), (-5, 4), (1, Int.MaxValue), (1, -9),
      (Int.MaxValue, Int.MaxValue), (0, 0)).foreach { case (p, l) =>
      val r = decodesSafely(withFooterInts(p, l), start)
      assert(r.isEmpty || r.contains(0), s"forged footer ($p,$l) must not parse rows")
    }
  }

  test("forged record lengths: a declared 2GB meta/payload length cannot allocate") {
    val rnd = new scala.util.Random(6)
    val (bytes, start) = validObject(rnd, 3)
    // first record starts at 0: magic | metaLen(4) | ... — forge both fields
    Seq(1 -> Int.MaxValue, 1 -> -44, 1 -> (Int.MaxValue / 2)).foreach { case (at, v) =>
      val b = bytes.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.BIG_ENDIAN).putInt(at, v)
      assert(decodesSafely(b, start).isEmpty, s"forged metaLen=$v must reject")
    }
    // forge the first record's payload length field
    val metaLen = java.nio.ByteBuffer.wrap(bytes, 1, 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    Seq(Int.MaxValue, -3, Int.MaxValue / 4).foreach { v =>
      val b = bytes.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.BIG_ENDIAN)
        .putInt(5 + metaLen, v)
      assert(decodesSafely(b, start).isEmpty, s"forged payloadLen=$v must reject")
    }
  }

  test("random garbage and out-of-range sparse-index entries never break boundedRead") {
    val rnd = new scala.util.Random(31)
    // pure garbage of assorted sizes
    (1 to 100).foreach { _ =>
      val junk = Array.fill(TieredObject.FooterLen + 1 + rnd.nextInt(4096))(
        rnd.nextInt().toByte)
      try { TieredObject.decodeAll(junk, 0L); () }
      catch {
        case _: IllegalArgumentException | _: IndexOutOfBoundsException |
             _: java.nio.BufferUnderflowException => ()
      }
    }
    // a VALID object whose sparse index is replaced with out-of-range
    // entries: bounded reads must stay inside the data block (clamped or
    // rejected), never read past the buffer or loop forever
    val (bytes, start) = validObject(rnd, 10)
    val meta0 = TieredObject.readMeta(bytes, start)
    val full = TieredObject.decodeAll(bytes, start)
    val evil = java.nio.ByteBuffer.allocate(16).order(java.nio.ByteOrder.BIG_ENDIAN)
      .putInt((meta0.endOffsetDelta / 2).max(1)).putInt(Int.MaxValue) // position way past dataLen
      .putInt(Int.MaxValue).putInt(-7)                               // absurd entry
      .array()
    val evilMeta = meta0.copy(sparseIndex = evil)
    val reads = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    def readRange(from: Int, len: Int): Array[Byte] = {
      reads += ((from, len))
      require(from >= 0 && len >= 0 && from + len <= meta0.dataLen + 1,
        s"decoder asked for out-of-buffer range ($from, $len)")
      java.util.Arrays.copyOfRange(bytes, from, from + len)
    }
    try {
      val rows = TieredObject.boundedReadAll(evilMeta, start, start + 4, readRange)
      // if it answers, the answer must be correct despite the evil index
      assert(rows.map(_.base_offset).forall(full.map(_.base_offset).contains))
    } catch {
      case _: IllegalArgumentException => () // loud rejection is acceptable
    }
    assert(reads.size < 1000, "bounded read must terminate, not loop on a corrupt index")
  }
}
