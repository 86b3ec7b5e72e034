package graft.model

import java.nio.{ByteBuffer, ByteOrder}

/** Codec for the reference's tiered-storage OBJECT layout — the byte format
  * a range server offloads to S3 and the interop surface a migration reads:
  *
  * {{{
  *   data block            => back-to-back FlatRecordBatch entries
  *   delimiter magic       => u8 (0x66)
  *   sparse index          => (record relative end offset: u32, position: u32)*
  *   footer (48 bytes)     => sparse index pos: u32 | sparse index size: u32
  *                            | 32 zero bytes | magic: u64 (0x88e241b785f4cff7)
  * }}}
  *
  * Layout per components/object-storage/src/range_offload.rs:29-37,324-340
  * (writer), 361-451 (`gen_sparse_index`/`gen_footer`) and
  * components/model/src/object.rs:4-5 (delimiter + footer magic constants).
  * All integers are big-endian (the Rust `bytes` crate's put_u32/put_u64).
  *
  * The sparse index is emitted mid-walk exactly like `gen_sparse_index`:
  * records accumulate into `passThrough`; once `passThrough >= sparseBytes`
  * the NEXT record contributes an entry `(its end offset - object start
  * offset, its start position in the data block)` and the accumulator
  * resets. The first record therefore never gets an entry (position 0 is
  * implicit), and `findBound`'s `position == 0 => size_hint = data_len`
  * special case (object.rs:70-72) matches.
  *
  * Reads honor the index the way the reference's
  * replication/src/stream/object_reader.rs does: `findBound` maps an offset
  * window to a byte range (object.rs:32-96), the caller range-reads ONLY
  * those bytes, `parseEntries` tolerates a truncated tail record (a bounded
  * read may cut one mid-record — records_block.rs:103-121 `reach_end`), and
  * batch-level trim keeps whole batches that INTERSECT the window
  * (records_block.rs:15-20 — straddle semantics, same as fetch).
  */
object TieredObject {

  /** model/src/object.rs:4 */
  val BlockDelimiter: Byte = 0x66
  /** model/src/object.rs:5 */
  val FooterMagic: Long = 0x88e241b785f4cff7L
  val FooterLen: Int = 48
  /** range_offload.rs:26 — index granularity of the production writer. */
  val DefaultSparseBytes: Int = 16 * 1024 * 1024

  /** The object's self-describing metadata (the fields the reference carries
    * in `ObjectMetadata`, model/src/object.rs:8-16; all recoverable from the
    * object bytes themselves plus the manifest-known start offset). */
  final case class ObjectMeta(
      startOffset: Long,
      endOffsetDelta: Int,
      dataLen: Int,
      sparseIndex: Array[Byte]) {
    def endOffset: Long = startOffset + endOffsetDelta
  }

  /** One parsed index entry: `endOffset` = absolute record end offset,
    * `position` = record start byte in the data block. */
  final case class IndexEntry(endOffset: Long, position: Int)

  def indexEntries(meta: ObjectMeta): Seq[IndexEntry] = {
    val bb = ByteBuffer.wrap(meta.sparseIndex).order(ByteOrder.BIG_ENDIAN)
    val out = Seq.newBuilder[IndexEntry]
    while (bb.remaining() >= 8) {
      val rel = bb.getInt & 0xffffffffL
      val pos = bb.getInt
      out += IndexEntry(meta.startOffset + rel, pos)
    }
    out.result()
  }

  /** Build one object from FlatRecordBatch entries (each already encoded).
    * Mirrors range_offload.rs `write0`: data, delimiter, sparse index,
    * footer. Returns the full object bytes plus the metadata the offloader
    * would COMMIT_OBJECT ([[ObjectMeta]]).
    *
    * @param startOffset the object's first logical offset (the offloader
    *   knows it from the range; the index stores offsets relative to it).
    * @param sparseBytes index granularity — an entry lands after at least
    *   this many record bytes pass through (range_offload.rs:383-427).
    */
  def encode(entries: Seq[Array[Byte]], startOffset: Long,
             sparseBytes: Int = DefaultSparseBytes): (Array[Byte], ObjectMeta) = {
    // entries of unknown provenance: recover each end offset by decoding
    // the frame (validates framing as a side effect). Callers that already
    // KNOW the offsets should use [[encodeWithOffsets]] — this path copies
    // every payload once more just to read two meta fields, which measured
    // as ~a quarter of the export head's time in GC (round 17).
    val ends = entries.map { e =>
      val (row, consumed) = FlatRecordBatch.decodeOne(e, 0)
      require(consumed == e.length, s"entry has trailing bytes: $consumed != ${e.length}")
      row.base_offset + row.last_offset_delta
    }
    encodeWithOffsets(entries, ends, startOffset, sparseBytes)
  }

  /** [[encode]] for callers that already know each entry's logical END
    * offset (`base_offset + last_offset_delta`) — the export/offload path
    * encodes rows it holds in hand, so re-decoding every frame (a full
    * payload copy + FlatBuffers walk per entry, allocating the corpus a
    * second time) was pure churn. Byte-identical output to [[encode]]. */
  def encodeWithOffsets(entries: Seq[Array[Byte]], endOffsets: Seq[Long],
                        startOffset: Long,
                        sparseBytes: Int = DefaultSparseBytes): (Array[Byte], ObjectMeta) = {
    require(entries.nonEmpty, "empty object")
    require(entries.size == endOffsets.size,
      s"${entries.size} entries vs ${endOffsets.size} end offsets")
    encodeCore(entries.map(_.length), endOffsets, startOffset, sparseBytes,
      buf => entries.foreach(buf.put))
  }

  /** [[encodeWithOffsets]] with frames encoded ON THE FLY into the object
    * buffer: callers that hold decoded [[RecordBatchRow]]s (the export /
    * offload path) previously materialized every frame with
    * [[FlatRecordBatch.encode]] just to copy it into the object — a full
    * extra corpus copy per export, measured as a ~23% GC share on the
    * export head. Metas are tiny and pre-encoded once; payloads go straight
    * from the row into the object buffer. End offsets come from each row's
    * own meta (`base_offset + last_offset_delta`). Byte-identical output to
    * [[encodeWithOffsets]] over [[FlatRecordBatch.encode]]-ed entries
    * (property-pinned in InteropSpec). */
  def encodeRows(rows: Seq[RecordBatchRow], startOffset: Long,
                 sparseBytes: Int = DefaultSparseBytes): (Array[Byte], ObjectMeta) = {
    require(rows.nonEmpty, "empty object")
    val metas = rows.map(FlatRecordBatch.encodeMeta)
    def payloadOf(r: RecordBatchRow): Array[Byte] =
      if (r.payload == null) Array.emptyByteArray else r.payload
    val lengths = rows.lazyZip(metas).map((r, m) => 9 + m.length + payloadOf(r).length)
    encodeCore(lengths, rows.map(r => r.base_offset + r.last_offset_delta),
      startOffset, sparseBytes,
      buf => rows.lazyZip(metas).foreach((r, m) =>
        FlatRecordBatch.encodeInto(m, payloadOf(r), buf)))
  }

  /** Shared object-assembly core: sparse index + footer from per-entry
    * frame LENGTHS and end offsets, with the data block written by
    * `writeData` (which must emit exactly `sum(lengths)` bytes at the
    * buffer's start). Layout per range_offload.rs `write0`. */
  private def encodeCore(lengths: Seq[Int], endOffsets: Seq[Long],
                         startOffset: Long, sparseBytes: Int,
                         writeData: ByteBuffer => Unit): (Array[Byte], ObjectMeta) = {
    val dataLen = lengths.iterator.sum
    val index = ByteBuffer.allocate(16 * (dataLen / math.max(1, sparseBytes) + 1))
      .order(ByteOrder.BIG_ENDIAN)
    var passThrough = 0L
    var position = 0
    var endOffset = startOffset
    lengths.zip(endOffsets).foreach { case (len, eo) =>
      endOffset = eo
      if (passThrough >= sparseBytes) {
        index.putInt((endOffset - startOffset).toInt)
        index.putInt(position)
        passThrough = 0L
      } else passThrough += len
      position += len
    }
    val indexBytes = java.util.Arrays.copyOf(index.array(), index.position())
    val buf = ByteBuffer.allocate(dataLen + 1 + indexBytes.length + FooterLen)
      .order(ByteOrder.BIG_ENDIAN)
    writeData(buf)
    require(buf.position() == dataLen,
      s"writeData emitted ${buf.position()} bytes, expected $dataLen")
    buf.put(BlockDelimiter)
    buf.put(indexBytes)
    // footer, range_offload.rs:440-450: index pos (data_len + 1 delimiter),
    // index size, zero padding to 40, magic
    buf.putInt(dataLen + 1)
    buf.putInt(indexBytes.length)
    buf.put(new Array[Byte](40 - 8))
    buf.putLong(FooterMagic)
    (buf.array(), ObjectMeta(startOffset, (endOffset - startOffset).toInt,
      dataLen, indexBytes))
  }

  /** Recover [[ObjectMeta]] from full object bytes: validate the footer
    * magic and the delimiter, slice the sparse index, and derive the end
    * offset from the last record's meta (gen_sparse_index's second pass,
    * range_offload.rs:428-438). */
  def readMeta(bytes: Array[Byte], startOffset: Long): ObjectMeta = {
    require(bytes.length >= FooterLen + 1, s"object too short: ${bytes.length}")
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val magic = bb.getLong(bytes.length - 8)
    require(magic == FooterMagic,
      f"bad footer magic 0x$magic%016x (want 0x$FooterMagic%016x)")
    val footerBase = bytes.length - FooterLen
    val indexPos = bb.getInt(footerBase)
    val indexLen = bb.getInt(footerBase + 4)
    val dataLen = indexPos - 1
    require(dataLen >= 0 && indexLen >= 0 &&
        indexPos.toLong + indexLen <= footerBase,
      s"corrupt footer: indexPos=$indexPos indexLen=$indexLen len=${bytes.length}")
    require(bytes(dataLen) == BlockDelimiter,
      f"bad block delimiter 0x${bytes(dataLen)}%02x at $dataLen")
    val index = java.util.Arrays.copyOfRange(bytes, indexPos, indexPos + indexLen)
    // end offset = last record's base_offset + last_offset_delta. Framing is
    // validated per frame (same requires as decodeOne) but payloads are NOT
    // materialized: the old full decodeOne walk allocated the whole data
    // block a second time just to read two meta fields — readMeta sits under
    // every decodeAll/ingest/backfill, so that was a full extra corpus copy
    // per object read (r17 optimization; parseEntries still fully decodes
    // the records actually returned to callers).
    var pos = 0
    var end = startOffset
    while (pos < dataLen) {
      val (bo, d, _, n) = FlatRecordBatch.decodeOffsetMeta(bytes, pos)
      end = bo + d
      pos += n
    }
    ObjectMeta(startOffset, (end - startOffset).toInt, dataLen, index)
  }

  /** Per-record `(base_offset, last_offset_delta, base_timestamp)` WITHOUT
    * materializing payloads — the metadata-only projection a planning pass
    * needs (EsLog.backfill's cut planning + stats: decide with small rows,
    * move the heavy bytes exactly once). Validates the same framing as
    * [[decodeAll]] (footer magic, delimiter, per-frame magic + lengths);
    * row-for-row aligned with [[decodeAll]]'s output on well-formed
    * objects (property-pinned in InteropSpec). */
  def decodeOffsets(bytes: Array[Byte]): Seq[(Long, Int, Long)] = {
    val meta = readMeta(bytes, 0L)
    val out = Seq.newBuilder[(Long, Int, Long)]
    var pos = 0
    while (pos < meta.dataLen) {
      val (bo, d, ts, n) = FlatRecordBatch.decodeOffsetMeta(bytes, pos)
      out += ((bo, d, ts))
      pos += n
    }
    out.result()
  }

  /** Map an offset window to the byte range the read must touch — the
    * reference's `ObjectMetadata::find_bound` (model/src/object.rs:32-96).
    * Returns None when the window misses the object entirely.
    *
    * Start position: the last index entry whose end offset is <= `start`
    * (records before it cannot intersect); entries past it widen the size
    * hint so the scan window still covers `start`. With no index entry
    * before `start`, position 0 and the hint widens to the whole data block
    * (object.rs:70-72). End position: the first entry at-or-past `end` —
    * or past the size hint — cuts the range; otherwise the full block. */
  def findBound(meta: ObjectMeta, start: Long, end: Long,
                sizeHint: Int = 0): Option[(Int, Int)] = {
    if (start >= meta.endOffset) return None
    if (end <= meta.startOffset) return None
    val entries = indexEntries(meta)
    var hint = math.max(0, sizeHint)
    var startPos = 0
    if (start > meta.startOffset) {
      // entries whose end <= start advance the position; later ones widen
      // the hint so the window still covers `start` (object.rs:58-69). No
      // entry before start => position 0 and the hint becomes the whole
      // block (object.rs:70-72, unconditional on widening).
      entries.foreach { e =>
        if (e.endOffset <= start) startPos = e.position
        else hint += e.position - startPos
      }
      if (startPos == 0) hint = meta.dataLen
    }
    // first entry at-or-past `end`, or past the hint, cuts the range — in
    // that order (object.rs:75-93). A zero hint cuts at the first eligible
    // entry: the smallest index-aligned range, like the reference. ONE
    // deliberate divergence: only entries STRICTLY PAST the start position
    // can cut (the reference compares `index_position - start_position >=
    // size_hint` in u32, which WRAPS for entries at/before the start
    // position — object.rs:88-91 — and would cut the range to zero or
    // invert it; its callers mask this with large batch hints).
    var endPos = meta.dataLen
    var cut = false
    entries.foreach { e =>
      if (!cut && e.position > startPos) {
        if (e.endOffset >= end) { endPos = e.position; cut = true }
        else if (e.position - startPos >= hint) { endPos = e.position; cut = true }
      }
    }
    if (endPos < startPos) endPos = startPos
    Some((startPos, math.min(endPos, meta.dataLen)))
  }

  /** Parse a (possibly bounded) data-block slice into rows, tolerating one
    * truncated record at the tail (records_block.rs:103-121: a short
    * metadata or payload read sets `reach_end` and the partial record is
    * dropped — never an error on a bounded read). */
  def parseEntries(bytes: Array[Byte], from: Int, until: Int): Seq[RecordBatchRow] = {
    val out = Seq.newBuilder[RecordBatchRow]
    var pos = from
    var reachEnd = false
    while (pos < until && !reachEnd) {
      if (until - pos < 9) reachEnd = true
      else {
        require(bytes(pos) == FlatRecordBatch.Magic,
          f"bad record magic 0x${bytes(pos)}%02x at $pos")
        val metaLen = ByteBuffer.wrap(bytes, pos + 1, 4).order(ByteOrder.BIG_ENDIAN).getInt
        // negative declared lengths are corruption, not a truncated tail —
        // reject loudly (and guard the additions against Int overflow)
        require(metaLen >= 0, s"negative meta length $metaLen at $pos")
        if (pos + 5 + metaLen.toLong + 4 > until) reachEnd = true
        else {
          val payloadLen =
            ByteBuffer.wrap(bytes, pos + 5 + metaLen, 4).order(ByteOrder.BIG_ENDIAN).getInt
          require(payloadLen >= 0, s"negative payload length $payloadLen at $pos")
          if (pos + 9 + metaLen.toLong + payloadLen > until) reachEnd = true
          else {
            val (row, n) = FlatRecordBatch.decodeOne(bytes, pos)
            out += row
            pos += n
          }
        }
      }
    }
    out.result()
  }

  /** Full-object decode: validate framing, parse every record. */
  def decodeAll(bytes: Array[Byte], startOffset: Long = 0L): Seq[RecordBatchRow] = {
    val meta = readMeta(bytes, startOffset)
    parseEntries(bytes, 0, meta.dataLen)
  }

  /** Bounded read through the sparse index: compute the byte range with
    * [[findBound]], fetch ONLY those bytes via `readRange(from, len)`, parse
    * with truncated-tail tolerance, then trim to batches INTERSECTING
    * `[start, end)` (records_block.rs:15-20 — whole-batch straddle
    * semantics). The caller's `readRange` is the paid range-GET; a unit pin
    * counts its bytes against the index-selected bound. */
  def boundedRead(meta: ObjectMeta, start: Long, end: Long,
                  readRange: (Int, Int) => Array[Byte],
                  sizeHint: Int = 0): Seq[RecordBatchRow] =
    findBound(meta, start, end, sizeHint) match {
      case None => Seq.empty
      case Some((from, until)) =>
        val slice = readRange(from, until - from)
        parseEntries(slice, 0, slice.length)
          .filter(r => r.endOffset > start && r.base_offset < end)
    }

  /** [[boundedRead]] until the window is satisfied — the reference's fetch
    * contract: one bounded read returns a PREFIX of the window (find_bound
    * cuts at index granularity) and "the invoker should loop invoke fetch
    * util the Dataset fullfil the need" (replication_stream.rs:395,
    * object_reader.rs:35-80). Each iteration resumes at the last batch's
    * end offset. An empty bounded read can still leave the window
    * unsatisfied — find_bound's end cut excludes a record ending exactly AT
    * the requested end (object.rs:85-88; the reference masks this at 16 MiB
    * index granularity inside its gap-fill loop, object_stream.rs:62-90) —
    * so the loop retries once per position with the end bound relaxed one
    * offset and the hint widened, then trims back to the true window. */
  def boundedReadAll(meta: ObjectMeta, start: Long, end: Long,
                     readRange: (Int, Int) => Array[Byte],
                     sizeHint: Int = 0): Seq[RecordBatchRow] = {
    val out = Seq.newBuilder[RecordBatchRow]
    var cur = start
    var done = false
    val hardEnd = math.min(end, meta.endOffset)
    while (!done && cur < hardEnd) {
      val got = boundedRead(meta, cur, end, readRange, sizeHint) match {
        case s if s.nonEmpty => s
        case _ =>
          val relaxed = if (end == Long.MaxValue) end else end + 1
          boundedRead(meta, cur, relaxed, readRange, meta.dataLen)
            .filter(_.base_offset < end)
      }
      if (got.isEmpty) done = true
      else { out ++= got; cur = got.last.endOffset }
    }
    out.result()
  }
}
