package graft.model

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Wire/storage flat encoding of a record batch.
  *
  * Layout follows the reference's `FlatRecordBatch`
  * (components/model/src/record/flat_record.rs:20-38 and
  * components/model/src/payload.rs:30-79):
  *
  * {{{
  *   Magic(1B = 0x22) | MetaLen(4B) | Meta | PayloadLen(4B) | Payload
  * }}}
  *
  * The reference serializes Meta as a FlatBuffers table; we use a fixed
  * little-endian binary meta record instead (no FlatBuffers dependency in this
  * build), with the same field set and the same framing, so a stream of
  * entries is parsed exactly like the reference's append-frame payload
  * (components/protocol/fbs/rpc.fbs:263-278): back-to-back flat entries.
  *
  * Meta layout (little-endian):
  * {{{
  *   stream_id i64 | range_index i32 | flags i16 | base_offset i64 |
  *   last_offset_delta i32 | base_timestamp i64 | prop_count u16 |
  *   (key_len u16 | key utf8 | val_len u16 | val utf8)*
  * }}}
  */
object FlatRecordBatch {
  val Magic: Byte = 0x22

  private val FixedMetaLen = 8 + 4 + 2 + 8 + 4 + 8 + 2

  def encode(r: RecordBatchRow): Array[Byte] = {
    val props = if (r.properties == null) Seq.empty else r.properties.toSeq.sortBy(_._1)
    val propBytes = props.map { case (k, v) =>
      (k.getBytes(StandardCharsets.UTF_8), v.getBytes(StandardCharsets.UTF_8))
    }
    require(propBytes.size <= 0xffff, s"too many properties: ${propBytes.size} > 65535")
    propBytes.foreach { case (k, v) =>
      require(k.length <= 0xffff && v.length <= 0xffff,
        s"property key/value exceeds 65535 UTF-8 bytes (key=${k.length}, value=${v.length})")
    }
    val metaLen = FixedMetaLen + propBytes.map { case (k, v) => 4 + k.length + v.length }.sum
    val payload = if (r.payload == null) Array.emptyByteArray else r.payload
    val buf = ByteBuffer.allocate(1 + 4 + metaLen + 4 + payload.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(Magic)
    buf.putInt(metaLen)
    buf.putLong(r.stream_id)
    buf.putInt(r.range_index)
    buf.putShort(r.flags)
    buf.putLong(r.base_offset)
    buf.putInt(r.last_offset_delta)
    buf.putLong(r.base_timestamp)
    buf.putShort(propBytes.size.toShort)
    propBytes.foreach { case (k, v) =>
      buf.putShort(k.length.toShort); buf.put(k)
      buf.putShort(v.length.toShort); buf.put(v)
    }
    buf.putInt(payload.length)
    buf.put(payload)
    buf.array()
  }

  /** Decode one entry starting at `offset`; returns (row, bytesConsumed). */
  def decodeOne(bytes: Array[Byte], offset: Int): (RecordBatchRow, Int) = {
    val buf = ByteBuffer.wrap(bytes, offset, bytes.length - offset)
      .order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.get()
    require(magic == Magic, s"bad magic $magic at $offset (want $Magic)")
    val metaLen = buf.getInt
    val metaEnd = buf.position() + metaLen
    val streamId = buf.getLong
    val rangeIndex = buf.getInt
    val flags = buf.getShort
    val baseOffset = buf.getLong
    val delta = buf.getInt
    val ts = buf.getLong
    val nProps = buf.getShort & 0xffff
    val props = Map.newBuilder[String, String]
    var i = 0
    while (i < nProps) {
      val kl = buf.getShort & 0xffff
      val k = new Array[Byte](kl); buf.get(k)
      val vl = buf.getShort & 0xffff
      val v = new Array[Byte](vl); buf.get(v)
      props += new String(k, StandardCharsets.UTF_8) -> new String(v, StandardCharsets.UTF_8)
      i += 1
    }
    require(buf.position() == metaEnd, s"meta length mismatch: ${buf.position()} != $metaEnd")
    val payloadLen = buf.getInt
    val payload = new Array[Byte](payloadLen)
    buf.get(payload)
    val row = RecordBatchRow(streamId, rangeIndex, flags, baseOffset, delta, ts, props.result(), payload)
    (row, buf.position() - offset)
  }

  def decode(bytes: Array[Byte]): RecordBatchRow = decodeOne(bytes, 0)._1

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
