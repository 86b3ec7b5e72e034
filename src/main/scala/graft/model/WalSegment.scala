package graft.model

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

/** Codec for the reference's WAL segment layout — the on-disk record framing
  * a range server's store writes and recovery scans. Migration forensics:
  * given the segment files of a decommissioned node, recover every committed
  * record batch (and stop, like recovery does, at the first torn write).
  *
  * {{{
  *   +---------+-----------+-----------+--- ... ---+
  *   | CRC (4B)| Size (3B) | Type (1B) | Payload   |
  *   +---------+-----------+-----------+--- ... ---+
  * }}}
  *
  * Format per components/store/src/io/record.rs:3-38: Size and Type are one
  * big-endian u32 (`len << 8 | type`, record.rs:42-55). Types: Zero = the
  * segment footer (zero padding + earliest/latest record timestamps,
  * record.rs:25-31); Full = a whole record; First/Middle/Last group
  * fragments of a record larger than the writer's block size into one
  * logical payload (record.rs:14-16).
  *
  * CRC per segment.rs:310-328 (`checksum_record`): crc32(payload) is folded
  * with the SEGMENT's base WAL offset — `crc32(be32(crc32(payload)) ++
  * be64(segment_wal_offset))` — so a recycled segment file can never serve
  * a stale record whose bytes are intact but whose segment identity is
  * wrong. crc32 is CRC-32/IEEE (the Rust `crc32fast` crate; identical to
  * `java.util.zip.CRC32`).
  *
  * Scan per wal.rs:166-244 (`scan_record`): read prefix; an insane length
  * (0, or past segment end) or a CRC mismatch marks the write boundary and
  * stops the scan — everything before it is committed, everything after is
  * a torn write; a Zero record is the footer (segment complete). Segment
  * files are named by their base WAL offset in decimal (segment.rs:204-208),
  * fixed-size, footer-terminated when sealed.
  *
  * Full record payloads are append entries — FlatRecordBatch frames
  * (model/src/payload.rs:30-79), decodable by [[FlatRecordBatch]].
  */
object WalSegment {

  val PrefixLen: Int = 8 // CRC(4) + Size(3) + Type(1), record.rs:4
  val FooterBodyLen: Int = 16 // earliest(8) + latest(8), record.rs:25-31

  /** The Size field is 3 bytes (`len << 8 | type`, record.rs:42-55), so no
    * single physical record — fragment, whole record or footer — may exceed
    * this; a longer length would silently truncate mod 2^24 and read back as
    * a torn tail (the reference never hits it because its writer fragments
    * at block granularity far below 16 MiB). Writers here enforce it. */
  val MaxRecordLen: Int = 0xFFFFFF

  val TypeZero: Int = 0
  val TypeFull: Int = 1
  val TypeFirst: Int = 2
  val TypeMiddle: Int = 3
  val TypeLast: Int = 4

  private def crc32(bytes: Array[Byte], from: Int, len: Int): Long = {
    val c = new CRC32()
    c.update(bytes, from, len)
    c.getValue
  }

  /** segment.rs:317-328 — crc32 of the payload, folded with the segment's
    * base WAL offset. */
  def checksumRecord(payload: Array[Byte], from: Int, len: Int,
                     segmentWalOffset: Long): Int = {
    val inner = crc32(payload, from, len)
    val buf = ByteBuffer.allocate(12).order(ByteOrder.BIG_ENDIAN)
    buf.putInt(inner.toInt)
    buf.putLong(segmentWalOffset)
    crc32(buf.array(), 0, 12).toInt
  }

  def checksumRecord(payload: Array[Byte], segmentWalOffset: Long): Int =
    checksumRecord(payload, 0, payload.length, segmentWalOffset)

  /** One scanned segment: the committed record payloads (fragment groups
    * reassembled), whether the scan ended cleanly (footer, or exact end of
    * data with the segment still open), and the byte position the next
    * write would land at (= the reference's recovered `segment.written`). */
  final case class ScanResult(
      payloads: Seq[Array[Byte]],
      isSealed: Boolean, // Zero footer seen
      torn: Boolean,     // stopped at a CRC/length boundary
      writtenTo: Long)   // bytes of committed records + footer

  /** Write one segment: each payload becomes a Full record, or a
    * First/Middle.../Last fragment chain when longer than `blockSize`
    * (record.rs:14-16 grouping). With `segmentSize > 0` a Zero footer pads
    * the segment to exactly that size (sealed, like append_footer,
    * segment.rs:265-297); `segmentSize <= 0` writes a footer with no
    * padding. Timestamps land in the footer body (earliest/latest,
    * record.rs:25-31). */
  def writeSegment(payloads: Seq[Array[Byte]], walOffset: Long,
                   segmentSize: Int = 0, blockSize: Int = Int.MaxValue,
                   earliestTs: Long = 0L, latestTs: Long = 0L): Array[Byte] = {
    require(blockSize > 0, "blockSize must be positive")
    // fragment plan: (type, slice) per physical record
    val records = payloads.flatMap { p =>
      if (p.length <= blockSize) Seq((TypeFull, p, 0, p.length))
      else {
        val n = (p.length + blockSize - 1) / blockSize
        (0 until n).map { i =>
          val from = i * blockSize
          val len = math.min(blockSize, p.length - from)
          val t = if (i == 0) TypeFirst else if (i == n - 1) TypeLast else TypeMiddle
          (t, p, from, len)
        }
      }
    }
    records.foreach { case (_, _, _, len) =>
      require(len <= MaxRecordLen,
        s"record slice of $len bytes exceeds the 3-byte Size field " +
          s"(max $MaxRecordLen) — use a blockSize <= $MaxRecordLen so long " +
          "payloads fragment into First/Middle/Last chains")
    }
    val bodyLen = records.iterator.map { case (_, _, _, len) => PrefixLen + len }.sum
    // Footer padding is a record payload too, so it shares the 3-byte Size
    // limit: a mostly-empty large segment caps the footer record at
    // MaxRecordLen and fills the remainder with raw zeros AFTER it — readers
    // stop at the Zero footer (wal.rs:225-234), so trailing bytes are never
    // scanned and the segment still occupies exactly `segmentSize` bytes.
    val (footerPayloadLen, trailingZeros) =
      if (segmentSize > 0) {
        val pad = segmentSize - bodyLen - PrefixLen - FooterBodyLen
        require(pad >= 0, s"segmentSize $segmentSize too small for $bodyLen record bytes")
        val fp = math.min(pad + FooterBodyLen, MaxRecordLen)
        (fp, pad + FooterBodyLen - fp)
      } else (FooterBodyLen, 0)
    val total = bodyLen + PrefixLen + footerPayloadLen + trailingZeros
    val buf = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    records.foreach { case (t, p, from, len) =>
      buf.putInt(checksumRecord(p, from, len, walOffset))
      buf.putInt(len << 8 | t)
      buf.put(p, from, len)
    }
    // footer: zero padding + earliest + latest (segment.rs:265-297)
    val fp = new Array[Byte](footerPayloadLen)
    val fb = ByteBuffer.wrap(fp).order(ByteOrder.BIG_ENDIAN)
    fb.position(footerPayloadLen - FooterBodyLen)
    fb.putLong(earliestTs)
    fb.putLong(latestTs)
    buf.putInt(checksumRecord(fp, walOffset))
    buf.putInt(footerPayloadLen << 8 | TypeZero)
    buf.put(fp)
    buf.array()
  }

  /** Recovery scan (wal.rs:166-244): walk records, verify each CRC against
    * this segment's WAL offset, stop at the first insane length or CRC
    * mismatch (torn write — the recovered write boundary), finish at a Zero
    * footer (sealed) or the exact end of data (open, clean). Fragment
    * chains reassemble to one payload; a chain broken by the write boundary
    * (First without its Last) is dropped — it never committed. An
    * out-of-sequence fragment type (Middle/Last with no First, or a new
    * record inside an open chain) stops the scan like a corruption, and an
    * UNKNOWN type byte throws (wal.rs:238-241 panics there: unlike a torn
    * tail, an unknown type in CRC-valid bytes is format drift, not a crash
    * artifact). */
  def scanSegment(bytes: Array[Byte], walOffset: Long): ScanResult = {
    val out = Seq.newBuilder[Array[Byte]]
    var pos = 0
    var torn = false
    var sealedSeen = false
    var chain: Option[java.io.ByteArrayOutputStream] = None
    var done = false
    var committedTo = 0
    while (!done) {
      if (pos + PrefixLen > bytes.length) {
        // exact end-of-data with no footer: open segment, clean
        torn = pos != bytes.length
        done = true
      } else {
        val bb = ByteBuffer.wrap(bytes, pos, PrefixLen).order(ByteOrder.BIG_ENDIAN)
        val crc = bb.getInt
        val lenType = bb.getInt
        val len = lenType >>> 8
        val t = lenType & 0xff
        if (len == 0 || pos + PrefixLen + len > bytes.length) {
          torn = true; done = true // wal.rs:195-202
        } else if (checksumRecord(bytes, pos + PrefixLen, len, walOffset) != crc) {
          torn = true; done = true // wal.rs:209-219
        } else if (t == TypeZero) {
          sealedSeen = true
          pos += PrefixLen + len
          committedTo = pos
          done = true // wal.rs:225-234
        } else {
          require(t >= TypeFull && t <= TypeLast, s"unknown record type $t at $pos")
          val slice = java.util.Arrays.copyOfRange(bytes, pos + PrefixLen, pos + PrefixLen + len)
          (t, chain) match {
            case (TypeFull, None) => out += slice
            case (TypeFirst, None) =>
              val b = new java.io.ByteArrayOutputStream()
              b.write(slice); chain = Some(b)
            case (TypeMiddle, Some(b)) => b.write(slice)
            case (TypeLast, Some(b)) =>
              b.write(slice); out += b.toByteArray; chain = None
            case _ =>
              torn = true; done = true // fragment sequencing violation
          }
          if (!done) {
            pos += PrefixLen + len
            if (chain.isEmpty) committedTo = pos // whole records only
          }
        }
      }
    }
    ScanResult(out.result(), sealedSeen, torn, committedTo.toLong)
  }
}
