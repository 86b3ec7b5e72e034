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
    val decoded = FlatRecordBatch.decode(bytes)
    assert(sameRow(row, decoded))
    // re-encode must be byte-identical (deterministic: props sorted)
    assert(java.util.Arrays.equals(bytes, FlatRecordBatch.encode(decoded)))
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

  test("bad magic rejected") {
    val bytes = FlatRecordBatch.encode(RecordBatchRow(1, 0, 0, 0, 1, 0, Map.empty, Array[Byte](1)))
    bytes(0) = 0x23
    assertThrows[IllegalArgumentException](FlatRecordBatch.decode(bytes))
  }
}
