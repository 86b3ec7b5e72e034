package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state KMV (k-minimum-values) aggregate: keeps the k smallest
  * DISTINCT values of a long hash column, emitted as an ascending array.
  *
  * This is the 100 TB execution path for [[graft.operators.Sketch]]'s
  * distinct-count sketch. The declarative formulation (global distinct +
  * per-group window sort) shuffles EVERY distinct hash and sorts each group
  * in full; this aggregate holds at most k longs per group per partition,
  * partial-aggregates map-side, and merges by set-union-then-trim — the KMV
  * union rule — so the shuffle carries ≤ k longs per (group, partition).
  * Same state/merge shape as Spark's own `percentile_approx`
  * (TypedImperativeAggregate); the result is EXACTLY the k smallest distinct
  * hashes, bit-identical to the window formulation (unit-pinned), because
  * k-minima are order-insensitive — no approximation is introduced by
  * partial aggregation.
  */
case class KmvAgg(child: Expression, k: Int,
                  mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 2, "k must be at least 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_agg"

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // admit only if it can be among the k minima (constant-time reject for
      // the common case once the buffer is warm)
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    var go = true
    while (go && it.hasNext) {
      val h = it.next()
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
      else go = false // `other` ascends; nothing later can qualify
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvAgg =
    copy(child = newChild)
}
