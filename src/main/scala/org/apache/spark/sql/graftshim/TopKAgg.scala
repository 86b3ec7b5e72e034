package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer
import java.util.Comparator

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state "k smallest pairs" aggregate: keeps the k lexicographically
  * smallest DISTINCT `(sort_key, payload)` long pairs, emitted ascending as
  * an array of `struct<k: bigint, v: bigint>`.
  *
  * The general form of [[KmvAgg]]: per-group top-k (smallest sort key wins,
  * payload breaks ties deterministically) with O(k) state per group per
  * partition and map-side partial aggregation — the scale path for "k rows
  * per group" patterns the window formulation (`row_number <= k`) answers by
  * shuffling and sorting EVERY row of every group. Negate the sort key for
  * top-k-largest.
  */
case class TopKAgg(sortKey: Expression, payload: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[Array[Long]]]
    with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k >= 1, "k must be at least 1")

  override def left: Expression = sortKey
  override def right: Expression = payload
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_agg"

  private def cmp: Comparator[Array[Long]] = TopKAgg.PairComparator

  override def createAggregationBuffer(): java.util.TreeSet[Array[Long]] =
    new java.util.TreeSet[Array[Long]](cmp)

  private def admit(buf: java.util.TreeSet[Array[Long]], e: Array[Long]): Unit =
    if (buf.size < k) { buf.add(e); () }
    else if (cmp.compare(e, buf.last()) < 0) {
      if (buf.add(e)) { buf.pollLast(); () }
    }

  override def update(buf: java.util.TreeSet[Array[Long]],
                      input: InternalRow): java.util.TreeSet[Array[Long]] = {
    val sk = sortKey.eval(input)
    val pv = payload.eval(input)
    if (sk != null && pv != null)
      admit(buf, Array(sk.asInstanceOf[Long], pv.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[Array[Long]],
                     other: java.util.TreeSet[Array[Long]]): java.util.TreeSet[Array[Long]] = {
    val it = other.iterator()
    var go = true
    while (go && it.hasNext) {
      val e = it.next()
      // `other` ascends: once an element with a FULL buffer is >= the current
      // max, everything later is larger still — stop (a duplicate below the
      // max must NOT stop the scan, so the test is on order, not admission)
      if (buf.size >= k && cmp.compare(e, buf.last()) >= 0) go = false
      else admit(buf, e)
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[Array[Long]]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(e(0), e(1))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val e = it.next(); bb.putLong(e(0)); bb.putLong(e(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[Array[Long]](cmp)
    var i = 0
    while (i < n) { set.add(Array(bb.getLong, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): TopKAgg =
    copy(sortKey = newLeft, payload = newRight)
}

object TopKAgg {
  /** Lexicographic (sort_key, payload) order — a named serializable object
    * because the expression ships to executors with the plan. */
  object PairComparator extends Comparator[Array[Long]] with Serializable {
    override def compare(a: Array[Long], b: Array[Long]): Int = {
      val c = java.lang.Long.compare(a(0), b(0))
      if (c != 0) c else java.lang.Long.compare(a(1), b(1))
    }
  }
}
