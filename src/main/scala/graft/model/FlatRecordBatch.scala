package graft.model

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.google.flatbuffers.FlatBufferBuilder

/** Wire/storage flat encoding of a record batch — byte-compatible with the
  * reference's `FlatRecordBatch`:
  *
  * {{{
  *   Magic(i8 = 0x22) | MetaLen(i32 BE) | Meta(FlatBuffers) | PayloadLen(i32 BE) | Payload
  * }}}
  *
  * Framing per components/model/src/record/flat_record.rs:20-38 — note the
  * length prefixes are BIG-endian (the Rust `bytes` crate's `put_i32`/
  * `get_i32`). Meta is a genuine FlatBuffers `RecordBatchMeta` table
  * (components/protocol/fbs/model.fbs:6-36):
  *
  * {{{
  *   table RecordBatchMeta {
  *     stream_id: int64 (id: 0);  range_index: int32 (id: 1);
  *     flags: short (id: 2);      base_offset: int64 = -1 (id: 3);
  *     last_offset_delta: int32 (id: 4); base_timestamp: int64 (id: 5);
  *     properties: [KeyValue] (id: 6);
  *   }
  *   table KeyValue { key: string (id: 0, required); value: string (id: 1, required); }
  * }}}
  *
  * Encoding uses the official `com.google.flatbuffers.FlatBufferBuilder`
  * (ships with Spark's Arrow dependency); decoding walks the FlatBuffers
  * binary layout directly (root offset → vtable → fields), so a stream of
  * entries is parsed exactly like the reference's append-frame payload
  * (components/model/src/payload.rs:30-79): back-to-back flat entries.
  */
object FlatRecordBatch {
  val Magic: Byte = 0x22

  // model.fbs field ids (vtable slots are 4 + 2*id)
  private val FStreamId = 0
  private val FRangeIndex = 1
  private val FFlags = 2
  private val FBaseOffset = 3
  private val FLastOffsetDelta = 4
  private val FBaseTimestamp = 5
  private val FProperties = 6

  /** Serialize the meta table with the official builder. Properties are
    * sorted by key so encoding is deterministic. */
  private[model] def encodeMeta(r: RecordBatchRow): Array[Byte] = {
    val fbb = new FlatBufferBuilder(256)
    val props = if (r.properties == null) Seq.empty else r.properties.toSeq.sortBy(_._1)
    val propsVec =
      if (props.isEmpty) 0
      else {
        val kvOffsets = props.map { case (k, v) =>
          val ko = fbb.createString(k)
          val vo = fbb.createString(v)
          fbb.startTable(2)
          fbb.addOffset(0, ko, 0)
          fbb.addOffset(1, vo, 0)
          fbb.endTable()
        }
        fbb.startVector(4, kvOffsets.size, 4)
        kvOffsets.reverseIterator.foreach(fbb.addOffset)
        fbb.endVector()
      }
    fbb.startTable(7)
    fbb.addLong(FStreamId, r.stream_id, 0L)
    fbb.addInt(FRangeIndex, r.range_index, 0)
    fbb.addShort(FFlags, r.flags, 0)
    fbb.addLong(FBaseOffset, r.base_offset, -1L)
    fbb.addInt(FLastOffsetDelta, r.last_offset_delta, 0)
    fbb.addLong(FBaseTimestamp, r.base_timestamp, 0L)
    if (propsVec != 0) fbb.addOffset(FProperties, propsVec, 0)
    fbb.finish(fbb.endTable())
    fbb.sizedByteArray()
  }

  /** Exact byte length [[encode]] would produce, WITHOUT encoding — a
    * faithful size-only simulation of the FlatBufferBuilder's write
    * sequence in [[encodeMeta]] (downward writes, `prep` alignment, vtable
    * dedup, final minalign padding). Export planning passes (e.g.
    * [[graft.eslog.EsLog.exportWal]]'s roll plan) call this instead of
    * paying a second full encode; FlatRecordBatchSpec property-pins
    * `frameLength(r) == encode(r).length` over random rows. */
  def frameLength(r: RecordBatchRow): Int = {
    val payload = if (r.payload == null) 0 else r.payload.length
    1 + 4 + metaLength(r) + 4 + payload
  }

  private[model] def metaLength(r: RecordBatchRow): Int = {
    var t = 0        // bytes written, counted from the buffer's end
    var minalign = 1
    def prep(size: Int, additional: Int): Unit = {
      if (size > minalign) minalign = size
      t += (size - ((t + additional) % size)) % size
    }
    def put(n: Int): Unit = t += n
    // createString: terminator byte, align for the data, data, length prefix
    def string(s: String): Unit = {
      val len = s.getBytes(StandardCharsets.UTF_8).length
      prep(1, 0); put(1)
      prep(4, len); prep(1, len); put(len)
      put(4) // endVector's count
    }
    val seenVtables = scala.collection.mutable.Set.empty[Vector[Int]]
    // end a table given (slotId -> fieldOffset) records; returns nothing,
    // advances t; rewinds if an identical vtable was already written
    def endTable(objectStart: Int, fields: Map[Int, Int], nSlots: Int): Unit = {
      prep(4, 0); put(4) // soffset placeholder
      val vtableloc = t
      val trimmed = (0 until nSlots).lastIndexWhere(fields.contains) + 1
      val shorts = Vector((trimmed + 2) * 2, vtableloc - objectStart) ++
        (0 until trimmed).map(i => fields.get(i).map(vtableloc - _).getOrElse(0))
      val t0 = t
      shorts.foreach { _ => prep(2, 0); put(2) }
      if (seenVtables.contains(shorts)) t = vtableloc // dedup rewind
      else { seenVtables += shorts; require(t >= t0, "vtable sim underflow") }
    }
    val props = if (r.properties == null) Seq.empty else r.properties.toSeq.sortBy(_._1)
    if (props.nonEmpty) {
      props.foreach { case (k, v) =>
        string(k); string(v)
        val objectStart = t
        prep(4, 0); put(4); val f0 = t
        prep(4, 0); put(4); val f1 = t
        endTable(objectStart, Map(0 -> f0, 1 -> f1), 2)
      }
      prep(4, 4 * props.size); prep(4, 4 * props.size)
      props.foreach(_ => put(4))
      put(4) // endVector's count
    }
    val objectStart = t
    var fields = Map.empty[Int, Int]
    def addScalar(id: Int, size: Int, nonDefault: Boolean): Unit =
      if (nonDefault) { prep(size, 0); put(size); fields += (id -> t) }
    addScalar(FStreamId, 8, r.stream_id != 0L)
    addScalar(FRangeIndex, 4, r.range_index != 0)
    addScalar(FFlags, 2, r.flags != 0)
    addScalar(FBaseOffset, 8, r.base_offset != -1L)
    addScalar(FLastOffsetDelta, 4, r.last_offset_delta != 0)
    addScalar(FBaseTimestamp, 8, r.base_timestamp != 0L)
    addScalar(FProperties, 4, props.nonEmpty)
    endTable(objectStart, fields, 7)
    prep(minalign, 4); put(4) // finish: align, then the root uoffset
    t
  }

  def encode(r: RecordBatchRow): Array[Byte] = {
    val meta = encodeMeta(r)
    val payload = if (r.payload == null) Array.emptyByteArray else r.payload
    val buf = ByteBuffer.allocate(1 + 4 + meta.length + 4 + payload.length)
      .order(ByteOrder.BIG_ENDIAN) // framing lengths are BE (bytes crate put_i32)
    encodeInto(meta, payload, buf)
    buf.array()
  }

  /** Write one frame (magic | metaLen | meta | payloadLen | payload) into
    * `buf` at its current position, from a pre-encoded meta and the payload
    * ref — the copy-free half of [[encode]]. `buf` must be BIG_ENDIAN
    * (framing lengths are BE). [[graft.model.TieredObject.encodeRows]]
    * streams frames straight into the object buffer with this, so the
    * export path never materializes a standalone frame array per batch. */
  private[model] def encodeInto(meta: Array[Byte], payload: Array[Byte],
                                buf: ByteBuffer): Unit = {
    buf.put(Magic)
    buf.putInt(meta.length)
    buf.put(meta)
    buf.putInt(payload.length)
    buf.put(payload)
  }

  // ---- FlatBuffers binary walk (spec layout; all FB internals are LE) ----

  private final class Meta(bytes: Array[Byte], base: Int, len: Int) {
    private val bb = ByteBuffer.wrap(bytes, base, len).slice().order(ByteOrder.LITTLE_ENDIAN)
    private val table = bb.getInt(0) // root table position
    private val vtable = table - bb.getInt(table) // soffset (signed) back to vtable
    private val vtableLen = bb.getShort(vtable) & 0xffff

    /** Field position in the buffer, or 0 if absent (default applies). */
    private def fieldPos(id: Int): Int = {
      val slot = 4 + 2 * id
      if (slot >= vtableLen) 0
      else {
        val off = bb.getShort(vtable + slot) & 0xffff
        if (off == 0) 0 else table + off
      }
    }

    def getLong(id: Int, default: Long): Long = {
      val p = fieldPos(id); if (p == 0) default else bb.getLong(p)
    }
    def getInt(id: Int, default: Int): Int = {
      val p = fieldPos(id); if (p == 0) default else bb.getInt(p)
    }
    def getShort(id: Int, default: Short): Short = {
      val p = fieldPos(id); if (p == 0) default else bb.getShort(p)
    }

    private def indirect(p: Int): Int = p + bb.getInt(p) // uoffset to the object

    private def string(p: Int): String = {
      val s = indirect(p)
      val n = bb.getInt(s)
      // bound BEFORE allocating: a corrupt length field must reject loudly,
      // not reserve gigabytes
      require(n >= 0 && n <= bb.limit() - s - 4,
        s"string length $n overruns the meta table (${bb.limit() - s - 4} bytes left)")
      val arr = new Array[Byte](n)
      val dup = bb.duplicate(); dup.position(s + 4); dup.get(arr)
      new String(arr, StandardCharsets.UTF_8)
    }

    /** properties: [KeyValue] with required key/value strings. */
    def properties(id: Int): Map[String, String] = {
      val p = fieldPos(id)
      if (p == 0) return Map.empty
      val vec = indirect(p)
      val n = bb.getInt(vec)
      require(n >= 0 && n.toLong * 4 <= bb.limit().toLong - vec - 4,
        s"properties vector length $n overruns the meta table")
      (0 until n).map { i =>
        val elemP = vec + 4 + 4 * i
        val kv = indirect(elemP)
        // KeyValue table: same vtable walk, inline
        val kvVt = kv - bb.getInt(kv)
        val kvVtLen = bb.getShort(kvVt) & 0xffff
        def kvField(fid: Int): Int = {
          val slot = 4 + 2 * fid
          if (slot >= kvVtLen) 0
          else { val o = bb.getShort(kvVt + slot) & 0xffff; if (o == 0) 0 else kv + o }
        }
        val kp = kvField(0); val vp = kvField(1)
        require(kp != 0 && vp != 0, "KeyValue.key/value are required (model.fbs)")
        string(kp) -> string(vp)
      }.toMap
    }
  }

  /** Decode one entry starting at `offset`; returns (row, bytesConsumed).
    * Declared lengths are validated against the REMAINING bytes before any
    * allocation — adversarial frames (fuzzed objects, torn migrations) must
    * reject loudly, never over-allocate on a forged 2 GB length field. */
  def decodeOne(bytes: Array[Byte], offset: Int): (RecordBatchRow, Int) = {
    require(bytes.length - offset >= 9, s"frame truncated at $offset (${bytes.length - offset} bytes)")
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.BIG_ENDIAN)
    val magic = buf.get()
    require(magic == Magic, s"bad magic $magic at $offset (want $Magic)")
    val metaLen = buf.getInt
    val metaStart = buf.position()
    require(metaLen >= 0 && metaLen <= bytes.length - metaStart - 4,
      s"declared meta length $metaLen overruns the ${bytes.length - metaStart} remaining bytes")
    val meta = new Meta(bytes, metaStart, metaLen)
    buf.position(metaStart + metaLen)
    val payloadLen = buf.getInt
    require(payloadLen >= 0 && payloadLen <= buf.remaining(),
      s"declared payload length $payloadLen overruns the ${buf.remaining()} remaining bytes")
    val payload = new Array[Byte](payloadLen)
    buf.get(payload)
    val row = RecordBatchRow(
      meta.getLong(FStreamId, 0L),
      meta.getInt(FRangeIndex, 0),
      meta.getShort(FFlags, 0),
      meta.getLong(FBaseOffset, -1L),
      meta.getInt(FLastOffsetDelta, 0),
      meta.getLong(FBaseTimestamp, 0L),
      meta.properties(FProperties),
      payload)
    (row, buf.position() - offset)
  }

  def decode(bytes: Array[Byte]): RecordBatchRow = decodeOne(bytes, 0)._1

  /** Frame walk WITHOUT payload materialization: validates the framing
    * exactly like [[decodeOne]] (magic, meta/payload length bounds — same
    * requires, same messages) and reads ONLY the three offset-planning
    * fields from the FlatBuffers meta. No payload copy, no properties
    * decode — the metadata pass a planning step needs costs O(frames) of
    * arithmetic instead of a full corpus allocation (measured: the r16
    * backfill head decoded its 2.1 GB payload FOUR times per run, twice of
    * it purely to read these fields — optimization guide §8: decide with
    * small rows, move heavy bytes once).
    *
    * @return (base_offset, last_offset_delta, base_timestamp, bytesConsumed)
    */
  def decodeOffsetMeta(bytes: Array[Byte], offset: Int): (Long, Int, Long, Int) = {
    require(bytes.length - offset >= 9, s"frame truncated at $offset (${bytes.length - offset} bytes)")
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.BIG_ENDIAN)
    val magic = buf.get()
    require(magic == Magic, s"bad magic $magic at $offset (want $Magic)")
    val metaLen = buf.getInt
    val metaStart = buf.position()
    require(metaLen >= 0 && metaLen <= bytes.length - metaStart - 4,
      s"declared meta length $metaLen overruns the ${bytes.length - metaStart} remaining bytes")
    val meta = new Meta(bytes, metaStart, metaLen)
    buf.position(metaStart + metaLen)
    val payloadLen = buf.getInt
    require(payloadLen >= 0 && payloadLen <= buf.remaining(),
      s"declared payload length $payloadLen overruns the ${buf.remaining()} remaining bytes")
    (meta.getLong(FBaseOffset, -1L), meta.getInt(FLastOffsetDelta, 0),
      meta.getLong(FBaseTimestamp, 0L), buf.position() - offset + payloadLen)
  }

  /** Parse a back-to-back sequence of flat entries (an append-frame payload,
    * payload.rs:30-79). */
  def decodeAll(bytes: Array[Byte]): Seq[RecordBatchRow] = {
    val out = Seq.newBuilder[RecordBatchRow]
    var pos = 0
    while (pos < bytes.length) {
      val (row, n) = decodeOne(bytes, pos)
      out += row
      pos += n
    }
    out.result()
  }

  def encodeAll(rows: Seq[RecordBatchRow]): Array[Byte] = {
    val parts = rows.map(encode)
    val out = new Array[Byte](parts.map(_.length).sum)
    var pos = 0
    parts.foreach { p => System.arraycopy(p, 0, out, pos, p.length); pos += p.length }
    out
  }
}
