package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-state uniform row sample for quantiles over an UNBOUNDED value
  * domain: keeps the k lexicographically smallest distinct `(hash, value)`
  * pairs — a bottom-k-by-hash sample (hash = a deterministic 60-bit digest of
  * a unique row key), i.e. a uniform random-but-reproducible sample WITHOUT
  * replacement — and emits the sampled values ascending.
  *
  * Why this shape (vs a KLL/GK/t-digest sketch): those compactions depend on
  * arrival order, so a Spark run is not reproducible by an independent SQL
  * engine. Bottom-k by hash is ORDER-INDEPENDENT — the retained set is a pure
  * function of the input multiset — so partial aggregation, shuffles, and
  * retries can never change the answer, and the correctness oracle is plain
  * SQL (`DISTINCT h, v ORDER BY h, v LIMIT k`). Same merge law as KMV:
  * set-union then trim to the k smallest ([[KmvAgg]]); state is ≤ k pairs of
  * longs per group per partition, partials combine map-side, the shuffle
  * carries ≤ k pairs per (group, partition). Sampling error for a rank-q
  * read off the sample is the standard O(1/sqrt(k)) quantile bound.
  *
  * Values ride the pair (not a separate lookup) so one pass suffices; pair
  * distinctness keeps duplicate VALUES from distinct rows (their hashes
  * differ), which is exactly what a quantile sample must preserve.
  */
case class QuantileSampleAgg(left: Expression, right: Expression, k: Int,
                             mutableAggBufferOffset: Int = 0,
                             inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
    with ImplicitCastInputTypes with BinaryLike[Expression] {

  require(k >= 2, "k must be at least 2")

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "quantile_sample_agg"

  private def newBuf(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] = newBuf()

  private def admit(buf: java.util.TreeSet[(Long, Long)], p: (Long, Long)): Boolean = {
    if (buf.size < k) { buf.add(p); true }
    else if (buf.comparator.compare(p, buf.last()) < 0) {
      if (buf.add(p)) buf.pollLast()
      true
    } else false
  }

  override def update(buf: java.util.TreeSet[(Long, Long)],
                      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      admit(buf, (h.asInstanceOf[Long], v.asInstanceOf[Long]))
    buf
  }

  override def merge(buf: java.util.TreeSet[(Long, Long)],
                     other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    var go = true
    while (go && it.hasNext) {
      // `other` ascends; once one pair fails to qualify, none later can
      go = admit(buf, it.next())
    }
    buf
  }

  /** Sampled values ascending BY VALUE — ready for integer-rank quantile
    * reads (`element_at(vals, 1 + (n-1)*p div 1000)`). */
  override def eval(buf: java.util.TreeSet[(Long, Long)]): Any = {
    val out = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next()._2; i += 1 }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (h, v) = it.next(); bb.putLong(h); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = newBuf()
    var i = 0
    while (i < n) { set.add((bb.getLong, bb.getLong)); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSampleAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantileSampleAgg =
    copy(left = newLeft, right = newRight)
}
