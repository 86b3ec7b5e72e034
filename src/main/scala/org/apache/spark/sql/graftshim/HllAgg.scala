package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state HyperLogLog register aggregate over a 60-bit hash column:
  * a dense `m = 2^p`-byte register array per group, emitted as
  * `array<int>` of length m (index = bucket, value = register).
  *
  * This is the 100 TB execution path for [[graft.operators.Sketch]]'s HLL
  * family: the declarative `hllSketch` shuffles up to m sparse register
  * ROWS per group per partition; this aggregate holds exactly m bytes per
  * group, partial-aggregates map-side (ObjectHashAggregate), and merges by
  * register-wise max — the HLL merge law, so partial aggregation introduces
  * no approximation and the result is bit-identical to the declarative twin
  * (unit-pinned through `Sketch.hllSketchAgg`). Same rho/bucket derivation
  * as `Sketch.hllCells`: bucket = top p bits, rho = 1 + leading zeros of
  * the remaining `w = 60 - p` bits (rho ≤ w + 1 ≤ 59 fits a byte).
  */
case class HllAgg(child: Expression, p: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(p >= 2 && p <= 20, s"p must be in [2, 20]; got $p")

  private val w = 60 - p
  private val m = 1 << p
  private val suffixMask = (1L << w) - 1

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_agg"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // the contract is a 60-bit hash ([[graft.functions.Portable.hash60]]);
      // arbitrary user input (SQL: graft_hll over xxhash64/negative longs)
      // is reduced to its low 60 bits instead of indexing out of bounds —
      // identity for every in-contract value
      val h = v.asInstanceOf[Long] & ((1L << 60) - 1)
      val bucket = (h >>> w).toInt
      val suffix = h & suffixMask
      val rho =
        if (suffix == 0L) w + 1
        else w + 1 - (64 - java.lang.Long.numberOfLeadingZeros(suffix))
      if (rho > buf(bucket)) buf(bucket) = rho.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > buf(i)) buf(i) = other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}
