package graft.model

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import com.google.flatbuffers.FlatBufferBuilder

/** Codec for the PD's etcd metadata records — the METADATA half of a
  * migration. A real deployment's source of truth for stream boundaries,
  * epochs, trim offsets and retention config is the placement driver's etcd
  * keyspace, not the data files:
  *
  *  - stream records under `streams/<id20>` — values are FlatBuffers
  *    `Stream` tables (pd/pkg/server/storage/endpoint/stream.go:17-24,
  *    40-42; fbs shape rpc.fbs:479-492)
  *  - range records under `s/<streamID20>/ranges/<rangeID11>` — FlatBuffers
  *    `Range` tables (endpoint/range.go:20-33; fbs rpc.fbs:392-425)
  *  - a by-server index under `rs/<serverID11>/stream-range/<streamID20>/
  *    <rangeID11>` with NIL values (range.go:66-71) — pure lookup keys,
  *    carried for export fidelity, ignored on ingest
  *
  * Key ids are zero-padded decimal (`%020d` for int64, `%011d` for int32 —
  * endpoint/endpoint.go:24-27), so an etcd range scan walks ids in numeric
  * order. Values are plain (non-size-prefixed) FlatBuffers roots
  * (pd/pkg/util/fbutil: `builder.Finish(packable.Pack(builder))`).
  *
  * Encoding uses the official `com.google.flatbuffers.FlatBufferBuilder`
  * (same cross-check posture as [[FlatRecordBatch]]); decoding walks the
  * binary layout directly. Only the fields the metadata migration needs are
  * modeled; unknown table fields are skipped by the vtable walk, unknown
  * keys are reported as [[PdKey.Other]] and counted, never thrown on.
  */
object PdSnapshot {

  /** One PD stream record (rpc.fbs:479-492). */
  final case class PdStream(streamId: Long, replica: Int, ackCount: Int,
                            retentionMs: Long)

  /** One PD range record (rpc.fbs:392-425). `end = -1` means the range is
    * still mutable (open); sealed ranges have exclusive non-negative ends. */
  final case class PdRange(streamId: Long, epoch: Long, index: Int,
                           start: Long, end: Long, serverIds: Seq[Int])

  // ---- keys (endpoint/stream.go:21-24, endpoint/range.go:22-36) ----

  sealed trait PdKey
  object PdKey {
    final case class Stream(id: Long) extends PdKey
    final case class Range(streamId: Long, index: Int) extends PdKey
    final case class OnServer(serverId: Int, streamId: Long, index: Int) extends PdKey
    final case class Other(key: String) extends PdKey
  }

  def streamKey(id: Long): String = f"streams/$id%020d"
  def rangeKey(streamId: Long, index: Int): String =
    f"s/$streamId%020d/ranges/$index%011d"
  def rangeOnServerKey(serverId: Int, streamId: Long, index: Int): String =
    f"rs/$serverId%011d/stream-range/$streamId%020d/$index%011d"

  private val StreamRe = """streams/(\d{1,20})""".r
  private val RangeRe = """s/(\d{1,20})/ranges/(\d{1,11})""".r
  private val OnServerRe = """rs/(\d{1,11})/stream-range/(\d{1,20})/(\d{1,11})""".r

  /** Classify one etcd key (already stripped of any deployment rootPath —
    * the PD joins `<rootPath>/<key>`, kv/etcd.go:390). */
  def parseKey(key: String): PdKey = key match {
    case StreamRe(id)            => PdKey.Stream(id.toLong)
    case RangeRe(sid, idx)       => PdKey.Range(sid.toLong, idx.toInt)
    case OnServerRe(srv, sid, i) => PdKey.OnServer(srv.toInt, sid.toLong, i.toInt)
    case other                   => PdKey.Other(other)
  }

  // ---- FlatBuffers binary walk (all FB internals are little-endian) ----

  private final class Table(bytes: Array[Byte]) {
    private val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    private val table = bb.getInt(0)
    private val vtable = table - bb.getInt(table)
    private val vtableLen = bb.getShort(vtable) & 0xffff
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
    def getByte(id: Int, default: Byte): Byte = {
      val p = fieldPos(id); if (p == 0) default else bb.get(p)
    }
    /** For a `[RangeServer]` field: the vector elements' `server_id`s. */
    def serverIds(id: Int): Seq[Int] = {
      val p = fieldPos(id)
      if (p == 0) return Seq.empty
      val vec = p + bb.getInt(p)
      val n = bb.getInt(vec)
      (0 until n).map { i =>
        val elemP = vec + 4 + 4 * i
        val t = elemP + bb.getInt(elemP)
        val vt = t - bb.getInt(t)
        val vtLen = bb.getShort(vt) & 0xffff
        val slot = 4 // server_id is field id 0 (rpc.fbs:356-363)
        if (slot >= vtLen) -1
        else {
          val off = bb.getShort(vt + slot) & 0xffff
          if (off == 0) -1 else bb.getInt(t + off)
        }
      }
    }
  }

  /** Decode a `streams/<id>` value (fbs Stream, rpc.fbs:479-492). */
  def decodeStream(bytes: Array[Byte]): PdStream = {
    val t = new Table(bytes)
    PdStream(
      streamId = t.getLong(0, -1L),
      replica = t.getByte(1, 0).toInt,
      ackCount = t.getByte(2, 0).toInt,
      retentionMs = t.getLong(3, 0L))
  }

  /** Decode a `s/<id>/ranges/<idx>` value (fbs Range, rpc.fbs:392-425). */
  def decodeRange(bytes: Array[Byte]): PdRange = {
    val t = new Table(bytes)
    PdRange(
      streamId = t.getLong(0, -1L),
      epoch = t.getLong(1, -1L),
      index = t.getInt(2, -1),
      start = t.getLong(3, -1L),
      end = t.getLong(4, -1L),
      serverIds = t.serverIds(5))
  }

  // ---- encode (official builder — export + fixture cross-checks) ----

  /** Serialize a Stream table exactly like the PD's fbutil.Marshal would. */
  def encodeStream(s: PdStream): Array[Byte] = {
    val fbb = new FlatBufferBuilder(64)
    fbb.startTable(4)
    fbb.addLong(0, s.streamId, -1L)
    fbb.addByte(1, s.replica.toByte, 0)
    fbb.addByte(2, s.ackCount.toByte, 0)
    fbb.addLong(3, s.retentionMs, 0L)
    fbb.finish(fbb.endTable())
    fbb.sizedByteArray()
  }

  /** Serialize a Range table; servers get synthetic `<host>:<port>`
    * advertise addresses (the field is required in the schema). */
  def encodeRange(r: PdRange): Array[Byte] = {
    val fbb = new FlatBufferBuilder(128)
    val serverOffs = r.serverIds.map { sid =>
      val addr = fbb.createString(s"server-$sid:10911")
      fbb.startTable(2)
      fbb.addInt(0, sid, -1)
      fbb.addOffset(1, addr, 0)
      fbb.endTable()
    }
    val vec =
      if (serverOffs.isEmpty) 0
      else {
        fbb.startVector(4, serverOffs.size, 4)
        serverOffs.reverseIterator.foreach(fbb.addOffset)
        fbb.endVector()
      }
    fbb.startTable(9)
    fbb.addLong(0, r.streamId, -1L)
    fbb.addLong(1, r.epoch, -1L)
    fbb.addInt(2, r.index, -1)
    fbb.addLong(3, r.start, -1L)
    fbb.addLong(4, r.end, -1L)
    if (vec != 0) fbb.addOffset(5, vec, 0)
    fbb.finish(fbb.endTable())
    fbb.sizedByteArray()
  }

  /** Render one stream's full PD keyspace — the stream record, its range
    * records, and the by-server index keys (nil values) — as `(key, value)`
    * pairs in the exact layout `endpoint/stream.go` / `endpoint/range.go`
    * write. The building block of a PD-compatible metadata EXPORT. */
  def renderStream(s: PdStream, ranges: Seq[PdRange]): Seq[(String, Array[Byte])] = {
    val streamKv = Seq(streamKey(s.streamId) -> encodeStream(s))
    val rangeKvs = ranges.map(r => rangeKey(r.streamId, r.index) -> encodeRange(r))
    val indexKvs = for {
      r <- ranges; sid <- r.serverIds
    } yield rangeOnServerKey(sid, r.streamId, r.index) -> Array.emptyByteArray
    streamKv ++ rangeKvs ++ indexKvs
  }

  private[graft] def utf8(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.UTF_8)
}
