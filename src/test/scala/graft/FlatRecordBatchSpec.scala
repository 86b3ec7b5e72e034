package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.model.{FlatRecordBatch, RecordBatchRow}

class FlatRecordBatchSpec extends AnyFunSuite {

  /** scalatest-plus bridge is not in the offline cache; drive ScalaCheck
    * generators directly with fixed seeds for reproducibility. */
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def sameRow(a: RecordBatchRow, b: RecordBatchRow): Boolean =
    a.stream_id == b.stream_id && a.range_index == b.range_index &&
      a.flags == b.flags && a.base_offset == b.base_offset &&
      a.last_offset_delta == b.last_offset_delta &&
      a.base_timestamp == b.base_timestamp && a.properties == b.properties &&
      java.util.Arrays.equals(a.payload, b.payload)

  test("golden fixture roundtrips byte-identically (flat_record.rs:183-244 port)") {
    val row = RecordBatchRow(1L, 0, 0, 1024L, 10, 0L,
      Map("key" -> "value"), "hello world".getBytes("UTF-8"))
    val bytes = FlatRecordBatch.encode(row)
    assert(bytes(0) == FlatRecordBatch.Magic)
    // framing lengths are BIG-endian i32 (flat_record.rs uses bytes::put_i32)
    val metaLen = java.nio.ByteBuffer.wrap(bytes, 1, 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    assert(metaLen > 0 && metaLen < bytes.length)
    val payloadLen = java.nio.ByteBuffer.wrap(bytes, 5 + metaLen, 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN).getInt
    assert(payloadLen == "hello world".length)
    val decoded = FlatRecordBatch.decode(bytes)
    assert(sameRow(row, decoded))
    // re-encode must be byte-identical (deterministic: props sorted)
    assert(java.util.Arrays.equals(bytes, FlatRecordBatch.encode(decoded)))
  }

  test("decode parses frames written directly by the official FlatBufferBuilder") {
    // Independent of our encode(): build the RecordBatchMeta table with the
    // reference's own serialization library (field ids per model.fbs) and the
    // reference's BE framing, then decode with our binary walker.
    import com.google.flatbuffers.FlatBufferBuilder
    val fbb = new FlatBufferBuilder(64)
    val k = fbb.createString("content-type"); val v = fbb.createString("image/png")
    fbb.startTable(2); fbb.addOffset(0, k, 0); fbb.addOffset(1, v, 0)
    val kv = fbb.endTable()
    fbb.startVector(4, 1, 4); fbb.addOffset(kv)
    val vec = fbb.endVector()
    fbb.startTable(7)
    fbb.addLong(0, 77L, 0L)        // stream_id
    fbb.addInt(1, 3, 0)            // range_index
    fbb.addShort(2, 5.toShort, 0)  // flags
    fbb.addLong(3, 4096L, -1L)     // base_offset (default -1)
    fbb.addInt(4, 12, 0)           // last_offset_delta
    fbb.addLong(5, 1700000000000L, 0L) // base_timestamp
    fbb.addOffset(6, vec, 0)       // properties
    fbb.finish(fbb.endTable())
    val meta = fbb.sizedByteArray()
    val payload = "payload-bytes".getBytes("UTF-8")
    val frame = java.nio.ByteBuffer
      .allocate(1 + 4 + meta.length + 4 + payload.length)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .put(FlatRecordBatch.Magic).putInt(meta.length).put(meta)
      .putInt(payload.length).put(payload).array()
    val row = FlatRecordBatch.decode(frame)
    assert(row.stream_id == 77L && row.range_index == 3 && row.flags == 5)
    assert(row.base_offset == 4096L && row.last_offset_delta == 12)
    assert(row.base_timestamp == 1700000000000L)
    assert(row.properties == Map("content-type" -> "image/png"))
    assert(new String(row.payload, "UTF-8") == "payload-bytes")
    // omitted optional fields fall back to schema defaults (base_offset = -1)
    val fbb2 = new FlatBufferBuilder(16)
    fbb2.startTable(7); fbb2.addLong(0, 9L, 0L); fbb2.finish(fbb2.endTable())
    val meta2 = fbb2.sizedByteArray()
    val frame2 = java.nio.ByteBuffer.allocate(1 + 4 + meta2.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
      .put(FlatRecordBatch.Magic).putInt(meta2.length).put(meta2).putInt(0).array()
    val row2 = FlatRecordBatch.decode(frame2)
    assert(row2.stream_id == 9L && row2.base_offset == -1L && row2.properties.isEmpty)
  }

  test("append-frame payload: back-to-back entries decode (payload.rs:30-79)") {
    val rows = (0 until 10).map { i =>
      RecordBatchRow(42L, 0, 0, 233L + 10 * i, 10, 1000L + i, Map.empty, "test".getBytes)
    }
    val frame = FlatRecordBatch.encodeAll(rows)
    val decoded = FlatRecordBatch.decodeAll(frame)
    assert(decoded.size == 10)
    assert(rows.zip(decoded).forall { case (a, b) => sameRow(a, b) })
    // fixed-size entries: every encoded entry has the same length
    val n = FlatRecordBatch.encode(rows.head).length
    assert(frame.length == n * 10)
  }

  private val genRow: Gen[RecordBatchRow] = for {
    sid <- Gen.chooseNum(0L, Long.MaxValue / 2)
    ri <- Gen.chooseNum(0, Int.MaxValue / 2)
    flags <- Gen.chooseNum(Short.MinValue, Short.MaxValue)
    off <- Gen.chooseNum(0L, Long.MaxValue / 2)
    delta <- Gen.chooseNum(1, 10000)
    ts <- Gen.chooseNum(0L, 4102444800000L)
    nProps <- Gen.chooseNum(0, 8)
    props <- Gen.mapOfN(nProps, Gen.zip(Gen.alphaNumStr.map(_.take(20)), Gen.alphaNumStr.map(_.take(40))))
    payload <- Gen.containerOf[Array, Byte](Gen.chooseNum(Byte.MinValue, Byte.MaxValue))
  } yield RecordBatchRow(sid, ri, flags.toShort, off, delta, ts, props, payload)

  test("property: encode/decode roundtrip for arbitrary batches") {
    forAll(genRow) { row =>
      assert(sameRow(row, FlatRecordBatch.decode(FlatRecordBatch.encode(row))))
    }
  }

  test("property: frames of arbitrary batches roundtrip") {
    forAll(Gen.listOfN(5, genRow)) { rows =>
      val decoded = FlatRecordBatch.decodeAll(FlatRecordBatch.encodeAll(rows))
      assert(decoded.size == rows.size)
      assert(rows.zip(decoded).forall { case (a, b) => sameRow(a, b) })
    }
  }

  test("property: frameLength equals encode().length (size-only simulation)") {
    forAll(genRow, n = 400) { row =>
      assert(FlatRecordBatch.frameLength(row) == FlatRecordBatch.encode(row).length,
        s"frameLength mismatch for $row")
    }
    // default-valued fields are OMITTED from the table — exercise every
    // combination the generator's ranges never hit (zeros, base_offset = -1,
    // empty props, multi-byte UTF-8 keys)
    val edges = Seq(
      RecordBatchRow(0L, 0, 0, -1L, 0, 0L, Map.empty, Array.emptyByteArray),
      RecordBatchRow(1L, 0, 0, -1L, 0, 0L, Map.empty, Array[Byte](1)),
      RecordBatchRow(0L, 1, 0, 0L, 0, 0L, Map.empty, Array.emptyByteArray),
      RecordBatchRow(0L, 0, 1, -1L, 1, 0L, Map.empty, Array[Byte](1, 2, 3)),
      RecordBatchRow(0L, 0, 0, -1L, 0, 1L, Map("" -> ""), Array.emptyByteArray),
      RecordBatchRow(7L, 2, 3, 100L, 5, 9L, Map("κλειδί" -> "τιμή✓", "a" -> "б"), Array[Byte](9)),
      RecordBatchRow(0L, 0, 0, -1L, 0, 0L, Map("x" -> "y"), null),
      RecordBatchRow(Long.MaxValue, Int.MaxValue, Short.MaxValue, Long.MaxValue - 1,
        Int.MaxValue, Long.MaxValue, (1 to 20).map(i => s"k$i" -> s"v$i").toMap,
        new Array[Byte](1000)))
    edges.foreach { row =>
      assert(FlatRecordBatch.frameLength(row) == FlatRecordBatch.encode(row).length,
        s"frameLength mismatch for edge row $row")
    }
  }

  test("property: TieredObject.encodeRows is byte-identical to encodeWithOffsets over encoded frames") {
    import graft.model.TieredObject
    forAll(Gen.listOfN(4, genRow), n = 100) { rows0 =>
      // contiguous end offsets, the export path's shape
      var off = 100L
      val rows = rows0.map { r =>
        val withOff = r.copy(base_offset = off, last_offset_delta = math.max(1, r.last_offset_delta))
        off += withOff.last_offset_delta
        withOff
      }
      val startOff = rows.head.base_offset
      val entries = rows.map(FlatRecordBatch.encode)
      val ends = rows.map(r => r.base_offset + r.last_offset_delta)
      // tiny sparseBytes so the sparse index is exercised, not empty
      val (oldBytes, oldMeta) = TieredObject.encodeWithOffsets(entries, ends, startOff, sparseBytes = 64)
      val (newBytes, newMeta) = TieredObject.encodeRows(rows, startOff, sparseBytes = 64)
      assert(java.util.Arrays.equals(oldBytes, newBytes), "object bytes differ")
      assert(oldMeta.startOffset == newMeta.startOffset &&
        oldMeta.endOffset == newMeta.endOffset &&
        oldMeta.dataLen == newMeta.dataLen &&
        java.util.Arrays.equals(oldMeta.sparseIndex, newMeta.sparseIndex),
        "object meta differs")
    }
  }

  test("bad magic rejected") {
    val bytes = FlatRecordBatch.encode(RecordBatchRow(1, 0, 0, 0, 1, 0, Map.empty, Array[Byte](1)))
    bytes(0) = 0x23
    assertThrows[IllegalArgumentException](FlatRecordBatch.decode(bytes))
  }
}
