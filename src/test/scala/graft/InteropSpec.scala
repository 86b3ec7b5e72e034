package graft

import java.nio.{ByteBuffer, ByteOrder}
import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{FlatRecordBatch, RecordBatchRow, TieredObject, WalSegment}

/** Byte-level pins for the reference-interop codecs: the tiered-object
  * offload layout (range_offload.rs:324-451) and the WAL segment record
  * framing (record.rs:3-38, wal.rs:166-244). Golden objects are built
  * byte-by-byte and the layout invariants asserted against the reference's
  * documented positions — not just roundtripped. */
class InteropSpec extends AnyFunSuite {

  private def frame(id: Long, payloadLen: Int): Array[Byte] =
    FlatRecordBatch.encode(RecordBatchRow(
      7L, 0, 0, id, 1, 1000L + id, Map("k" -> s"v$id"),
      Array.fill[Byte](payloadLen)((id % 97).toByte)))

  // ---------------------------------------------------------- tiered object

  test("object layout: data | 0x66 | sparse index | 48-byte footer with magic") {
    val frames = (0L until 5L).map(i => frame(i, 40))
    val (bytes, meta) = TieredObject.encode(frames, startOffset = 0L, sparseBytes = 100)
    val dataLen = frames.map(_.length).sum
    assert(meta.dataLen === dataLen)
    assert(meta.endOffsetDelta === 5)
    // delimiter magic directly after the data block (model/src/object.rs:4)
    assert(bytes(dataLen) === TieredObject.BlockDelimiter)
    // footer: fixed 48 bytes, index pos = dataLen + 1, magic last
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val footerBase = bytes.length - TieredObject.FooterLen
    assert(bb.getInt(footerBase) === dataLen + 1)
    assert(bb.getInt(footerBase + 4) === meta.sparseIndex.length)
    (footerBase + 8 until bytes.length - 8).foreach(i => assert(bytes(i) === 0))
    assert(bb.getLong(bytes.length - 8) === TieredObject.FooterMagic)
    assert(TieredObject.FooterMagic === 0x88e241b785f4cff7L) // object.rs:5
  }

  test("encodeWithOffsets is byte-identical to encode (the export fast path)") {
    // the export path hands encode the end offsets it already knows; the
    // output (index entries included) must not differ by a byte from the
    // decode-recovered path — varied payload sizes so the sparse index
    // actually places entries
    val rows = (0L until 9L).map(i => RecordBatchRow(
      7L, 0, 0, i * 3, 3, 1000L + i, Map("k" -> s"v$i"),
      Array.fill[Byte](20 + (i % 4).toInt * 33)((i % 97).toByte)))
    val frames = rows.map(FlatRecordBatch.encode)
    val ends = rows.map(r => r.base_offset + r.last_offset_delta)
    Seq(1, 64, 100000).foreach { sb =>
      val (a, ma) = TieredObject.encode(frames, startOffset = 0L, sparseBytes = sb)
      val (b, mb) = TieredObject.encodeWithOffsets(frames, ends, 0L, sparseBytes = sb)
      assert(a.toSeq === b.toSeq, s"sparseBytes=$sb")
      assert(ma === mb.copy(sparseIndex = ma.sparseIndex), s"sparseBytes=$sb")
      assert(ma.sparseIndex.toSeq === mb.sparseIndex.toSeq, s"sparseBytes=$sb")
    }
    // mismatched lengths are loud
    intercept[IllegalArgumentException](
      TieredObject.encodeWithOffsets(frames, ends.init, 0L))
  }

  test("object sparse index: entries land after sparseBytes pass through, like gen_sparse_index") {
    // 5 equal records; sparseBytes = 2 records' worth => pass-through resets
    // exactly as range_offload.rs:383-427 walks it
    val frames = (10L until 15L).map(i => frame(i, 40))
    val rl = frames.head.length // all equal
    val (_, meta) = TieredObject.encode(frames, startOffset = 10L, sparseBytes = 2 * rl)
    val entries = TieredObject.indexEntries(meta)
    // walk: r0 pass=rl, r1 pass=2rl, r2 INDEXED (pass>=2rl; entry = its end
    // offset, its position), reset; r3 pass=rl, r4 pass=2rl — no more entries
    assert(entries === Seq(TieredObject.IndexEntry(13L, 2 * rl)))
    // re-derive the meta from the bytes alone
    val (bytes, _) = TieredObject.encode(frames, startOffset = 10L, sparseBytes = 2 * rl)
    val re = TieredObject.readMeta(bytes, startOffset = 10L)
    assert(re.dataLen === meta.dataLen)
    assert(re.endOffsetDelta === meta.endOffsetDelta)
    assert(re.sparseIndex.toSeq === meta.sparseIndex.toSeq)
  }

  test("object decodeAll round-trips every record") {
    val frames = (0L until 7L).map(i => frame(i, 10 + i.toInt))
    val (bytes, _) = TieredObject.encode(frames, startOffset = 0L, sparseBytes = 64)
    val rows = TieredObject.decodeAll(bytes)
    assert(rows.map(_.base_offset) === (0L until 7L))
    assert(rows.map(_.properties("k")) === (0L until 7L).map(i => s"v$i"))
    assert(rows(3).payload.length === 13)
  }

  test("decodeOffsets / decodeOffsetMeta align row-for-row with the full decode") {
    // varied payloads, deltas, timestamps and property shapes — the light
    // frame-header walk (no payload materialization) must report exactly
    // the (base_offset, last_offset_delta, base_timestamp) triple and the
    // byte consumption of the full decode, frame by frame
    val rows = (0L until 11L).map(i => RecordBatchRow(
      7L, (i % 3).toInt, (i % 2).toShort, i * 5, 5, (i * 37) % 11,
      if (i % 4 == 0) Map.empty[String, String] else Map("k" -> s"v$i", "x" -> "y"),
      Array.fill[Byte](10 + (i % 5).toInt * 17)((i % 89).toByte)))
    val frames = rows.map(FlatRecordBatch.encode)
    // frame-level walk == decodeOne, per frame
    frames.zip(rows).foreach { case (f, r) =>
      val (bo, d, ts, n) = FlatRecordBatch.decodeOffsetMeta(f, 0)
      val (full, nFull) = FlatRecordBatch.decodeOne(f, 0)
      assert((bo, d, ts) === ((full.base_offset, full.last_offset_delta,
        full.base_timestamp)))
      assert((bo, d, ts) === ((r.base_offset, r.last_offset_delta,
        r.base_timestamp)))
      assert(n === nFull && n === f.length)
    }
    // object-level walk == decodeAll's projection, and readMeta (now a
    // header walk itself) still recovers the exact end offset
    val (bytes, meta) = TieredObject.encode(frames, startOffset = 0L, sparseBytes = 64)
    val light = TieredObject.decodeOffsets(bytes)
    val full = TieredObject.decodeAll(bytes)
    assert(light === full.map(r =>
      (r.base_offset, r.last_offset_delta, r.base_timestamp)))
    assert(TieredObject.readMeta(bytes, 0L).endOffset === meta.endOffset)
    // truncated frames stay loud in the light walk too
    intercept[IllegalArgumentException](
      FlatRecordBatch.decodeOffsetMeta(frames.head.take(8), 0))
    intercept[IllegalArgumentException](
      FlatRecordBatch.decodeOffsetMeta(frames.head.take(frames.head.length - 1), 0))
  }

  test("object footer validation rejects a corrupted magic") {
    val (bytes, _) = TieredObject.encode(Seq(frame(0L, 8)), 0L)
    bytes(bytes.length - 1) = 0x00
    val e = intercept[IllegalArgumentException](TieredObject.readMeta(bytes, 0L))
    assert(e.getMessage.contains("magic"))
  }

  test("findBound mirrors object.rs: misses, start-aligned, index-guided start") {
    val frames = (0L until 8L).map(i => frame(i, 40))
    val rl = frames.head.length
    val (_, meta) = TieredObject.encode(frames, 0L, sparseBytes = 2 * rl)
    // entries at records 2, 5 (pass-through resets after each emit)
    val entries = TieredObject.indexEntries(meta)
    assert(entries.map(_.position) === Seq(2 * rl, 5 * rl))
    // window misses the object entirely
    assert(TieredObject.findBound(meta, 8L, 10L).isEmpty)
    assert(TieredObject.findBound(meta, 0L, 0L).isEmpty)
    // start == object start, zero hint: cut at the FIRST index entry
    // (object.rs:88-91 — position 0 - 0 >= 0)
    assert(TieredObject.findBound(meta, 0L, 8L, sizeHint = 0) === Some((0, 2 * rl)))
    // mid-object start: last entry with end <= start gives the position;
    // end bound cuts at the first entry at-or-past end
    assert(TieredObject.findBound(meta, 3L, 6L) === Some((2 * rl, 5 * rl)))
    // start past every entry: position = last entry, end = data len
    assert(TieredObject.findBound(meta, 6L, 8L) === Some((5 * rl, 8 * rl)))
  }

  test("bounded read touches ONLY the index-selected byte range and trims to the window") {
    val frames = (0L until 8L).map(i => frame(i, 40))
    val rl = frames.head.length
    val (bytes, meta) = TieredObject.encode(frames, 0L, sparseBytes = 2 * rl)
    val touched = new AtomicLong(0L)
    val readRange = (from: Int, len: Int) => {
      touched.addAndGet(len.toLong)
      java.util.Arrays.copyOfRange(bytes, from, from + len)
    }
    // ONE bounded read = the reference's read_first_object_blocks: the
    // find_bound byte range only — records at bytes [2rl, 5rl), r2 trimmed
    // (its end == the window start), a PREFIX of the window
    val first = TieredObject.boundedRead(meta, 3L, 6L, readRange)
    assert(touched.get() === 3L * rl)
    assert(touched.get() < meta.dataLen)
    assert(first.map(_.base_offset) === Seq(3L, 4L))
    // the fetch loop completes the window and equals the full parse + trim
    touched.set(0L)
    val rows = TieredObject.boundedReadAll(meta, 3L, 6L, readRange)
    assert(rows.map(_.base_offset) === Seq(3L, 4L, 5L))
    val full = TieredObject.decodeAll(bytes)
      .filter(r => r.endOffset > 3L && r.base_offset < 6L)
    assert(rows.map(_.base_offset) === full.map(_.base_offset))
    // without the reference's position-hint cache consecutive bounded reads
    // overlap at index granularity, but the loop stays range-bounded — it
    // never degenerates to repeated full-object reads
    assert(touched.get() <= 2L * meta.dataLen)
  }

  test("bounded read tolerates a mid-record cut (reach_end, records_block.rs:103-121)") {
    val frames = (0L until 4L).map(i => frame(i, 40))
    val rl = frames.head.length
    val (bytes, _) = TieredObject.encode(frames, 0L, sparseBytes = 64)
    // a slice ending mid-record parses the complete prefix and drops the tail
    val rows = TieredObject.parseEntries(bytes, 0, 2 * rl + 5)
    assert(rows.map(_.base_offset) === Seq(0L, 1L))
  }

  // ------------------------------------------------------------ WAL segment

  private val walOffset = 3L << 30

  test("WAL record framing: CRC | len<<8|type | payload, crc folded with segment offset") {
    val p = frame(0L, 16)
    val seg = WalSegment.writeSegment(Seq(p), walOffset)
    val bb = ByteBuffer.wrap(seg).order(ByteOrder.BIG_ENDIAN)
    val crc = bb.getInt(0)
    val lenType = bb.getInt(4)
    assert((lenType >>> 8) === p.length)            // Size in the high 3 bytes
    assert((lenType & 0xff) === WalSegment.TypeFull) // Type in the low byte
    assert(crc === WalSegment.checksumRecord(p, walOffset))
    // the same payload under a DIFFERENT segment offset must not validate
    // (recycled-segment protection, segment.rs:310-316)
    assert(crc !== WalSegment.checksumRecord(p, walOffset + 1))
  }

  test("WAL scan recovers records and stops at the footer (sealed)") {
    val ps = (0L until 6L).map(i => frame(i, 24))
    val seg = WalSegment.writeSegment(ps, walOffset, segmentSize = 4096)
    assert(seg.length === 4096) // padded to the fixed segment size
    val r = WalSegment.scanSegment(seg, walOffset)
    assert(r.isSealed && !r.torn)
    assert(r.writtenTo === 4096L)
    assert(r.payloads.map(p => FlatRecordBatch.decode(p).base_offset) === (0L until 6L))
  }

  test("WAL First/Middle/Last fragment chains reassemble to one payload") {
    val big = frame(9L, 500) // > blockSize => fragmented
    val small = frame(10L, 8)
    val seg = WalSegment.writeSegment(Seq(big, small), walOffset, blockSize = 100)
    // physical layout: First + 4-5 Middle + Last, then a Full
    val r = WalSegment.scanSegment(seg, walOffset)
    assert(!r.torn && r.isSealed)
    assert(r.payloads.length === 2)
    assert(r.payloads.head.toSeq === big.toSeq) // byte-exact reassembly
    assert(FlatRecordBatch.decode(r.payloads(1)).base_offset === 10L)
  }

  test("WAL corrupted CRC: records before survive, scan stops (torn)") {
    val ps = (0L until 5L).map(i => frame(i, 24))
    val seg = WalSegment.writeSegment(ps, walOffset)
    // corrupt one payload byte of the third record
    val rl = WalSegment.PrefixLen + ps.head.length
    seg(2 * rl + WalSegment.PrefixLen + 3) = (seg(2 * rl + WalSegment.PrefixLen + 3) ^ 0x1).toByte
    val r = WalSegment.scanSegment(seg, walOffset)
    assert(r.torn && !r.isSealed)
    assert(r.payloads.map(p => FlatRecordBatch.decode(p).base_offset) === Seq(0L, 1L))
    assert(r.writtenTo === 2L * rl) // the recovered write boundary
  }

  test("WAL scan under the WRONG segment offset recovers nothing") {
    val seg = WalSegment.writeSegment(Seq(frame(0L, 24)), walOffset)
    val r = WalSegment.scanSegment(seg, walOffset + (1L << 30))
    assert(r.torn && r.payloads.isEmpty)
  }

  test("WAL truncated tail (crash mid-write) drops the partial record cleanly") {
    val ps = (0L until 3L).map(i => frame(i, 24))
    val seg = WalSegment.writeSegment(ps, walOffset)
    val cut = java.util.Arrays.copyOf(seg, 2 * (WalSegment.PrefixLen + ps.head.length) + 5)
    val r = WalSegment.scanSegment(cut, walOffset)
    assert(r.torn)
    assert(r.payloads.length === 2)
  }

  test("WAL incomplete fragment chain (First without Last) never commits") {
    val big = frame(9L, 300)
    val seg = WalSegment.writeSegment(Seq(big), walOffset, blockSize = 100)
    // cut before the Last fragment lands: keep First + one Middle
    val fragLen = WalSegment.PrefixLen + 100
    val cut = java.util.Arrays.copyOf(seg, 2 * fragLen)
    val r = WalSegment.scanSegment(cut, walOffset)
    assert(r.payloads.isEmpty)
    assert(r.writtenTo === 0L)
  }

  test("WAL property: random payloads/block sizes round-trip; any truncation recovers a clean prefix") {
    val rnd = new scala.util.Random(42) // fixed seed — deterministic trials
    (1 to 100).foreach { trial =>
      val n = 1 + rnd.nextInt(8)
      val payloads = (0 until n).map { _ =>
        Array.fill(1 + rnd.nextInt(3000))(rnd.nextInt().toByte)
      }
      val blockSize = 1 + rnd.nextInt(1024)
      val off = math.abs(rnd.nextLong()) % (1L << 40)
      val seg = WalSegment.writeSegment(payloads, off, blockSize = blockSize)
      val full = WalSegment.scanSegment(seg, off)
      assert(full.isSealed && !full.torn, s"trial $trial")
      assert(full.payloads.map(_.toSeq) === payloads.map(_.toSeq), s"trial $trial")
      // torn-tail safety: truncating ANYWHERE yields some clean PREFIX of
      // the committed records — never a corrupted or reordered payload
      val cut = 1 + rnd.nextInt(seg.length - 1)
      val part = WalSegment.scanSegment(java.util.Arrays.copyOf(seg, cut), off)
      assert(part.payloads.map(_.toSeq) ===
        payloads.take(part.payloads.size).map(_.toSeq), s"trial $trial cut $cut")
    }
  }

  test("WAL 3-byte Size field: an over-long record slice is rejected loudly, never truncated") {
    // A 16 MiB+ payload with no fragmentation would write len mod 2^24 and
    // read back as a torn tail (silent data loss on re-ingest) — the writer
    // must fail instead.
    val big = new Array[Byte](WalSegment.MaxRecordLen + 1)
    val e = intercept[IllegalArgumentException](
      WalSegment.writeSegment(Seq(big), 0L, blockSize = Int.MaxValue))
    assert(e.getMessage.contains("3-byte Size field"))
    // the default export block size fragments the same payload fine
    val seg = WalSegment.writeSegment(Seq(big), 0L, blockSize = WalSegment.MaxRecordLen)
    val r = WalSegment.scanSegment(seg, 0L)
    assert(r.payloads.size == 1 && r.payloads.head.length == big.length && !r.torn)
  }

  test("WAL footer padding past 16 MiB: footer record caps at MaxRecordLen, scan still sees sealed") {
    // a mostly-empty LARGE sealed segment: footer padding exceeds the 3-byte
    // Size field; the footer record caps and raw zeros fill the remainder
    val segmentSize = 20 * 1024 * 1024
    val payloads = Seq(Array.fill(100)(7.toByte))
    val seg = WalSegment.writeSegment(payloads, 4096L, segmentSize = segmentSize,
      earliestTs = 11L, latestTs = 22L)
    assert(seg.length == segmentSize) // still exactly segment-sized
    val r = WalSegment.scanSegment(seg, 4096L)
    assert(r.isSealed && !r.torn)
    assert(r.payloads.map(_.toSeq) === payloads.map(_.toSeq))
  }
}
