package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join without a nested-loop plan.
  *
  * Spark plans a bare `p.x BETWEEN i.lo AND i.hi` join as
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) work and a broadcast
  * of one whole side, the classic non-equi-join scale killer. The standard
  * distributed fix is fixed-width bucketing: chop the number line into
  * `bucketWidth` cells, explode every interval to the cells it covers, map
  * every point to the ONE cell containing it, and the range predicate
  * becomes a bucket equi-join plus a residual bounds filter. Each point
  * lands in exactly one cell, so no dedup pass is needed; interval fan-out
  * is `(hi-lo)/bucketWidth + 1` rows, bounded by choosing the width near the
  * typical interval length.
  *
  * Works keyed or keyless: `keyCols` ride along in the equi-join condition,
  * so per-key ranges (sessions per user, validity windows per entity) join
  * co-partitioned.
  */
object RangeJoin {

  /** Floor division for any sign, in pure integer arithmetic: subtract the
    * positive mod, then exact integral `div` — no float anywhere (the
    * `/` operator would route longs through double, inexact past 2^53,
    * i.e. for nanosecond timestamps). Truncating division alone would split
    * negative points across two cells. */
  private[operators] def floorDiv(x: Column, w: Long): Column =
    call_function("div", x - pmod(x, lit(w)), lit(w))

  /** The [[floorDiv]] SQL text for oracle generation: the numerator is an
    * exact multiple of `w`, so integer division is exact for any sign. */
  def floorDivSql(x: String, w: Long): String =
    s"(($x - ((($x % $w) + $w) % $w)) // $w)"

  /** @param points    frame with an integral `pointCol`
    * @param intervals frame with integral `[loCol, hiCol]` (inclusive both
    *                  ends; rows with hi < lo never match)
    * @param keyCols   optional equality keys present on both sides
    * @param bucketWidth cell width — pick ≈ the typical interval length so
    *                  fan-out stays O(1) per interval
    * @return every (interval row ++ point row) pair where
    *         `lo <= point <= hi` (and keys equal), with both sides' columns
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // guard hi < lo: `sequence` DESCENDS for start > stop, which would
    // fabricate buckets for an empty interval — such rows must match nothing
    val iv = intervals.withColumn("_bucket",
      explode(when(col(loCol) <= col(hiCol),
        sequence(floorDiv(col(loCol), bucketWidth), floorDiv(col(hiCol), bucketWidth)))
        .otherwise(array().cast("array<long>"))))
    val pt = points.withColumn("_bucket", floorDiv(col(pointCol), bucketWidth))
    iv.join(pt, Seq("_bucket") ++ keyCols)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bucket")
  }

  /** Interval-overlap join — `[aLo,aHi] ∩ [bLo,bHi] ≠ ∅` (inclusive ends) —
    * with the same bucketing scheme. Both sides explode to covering cells;
    * an overlapping pair shares every cell their intersection covers, so the
    * pair is emitted ONLY from the intersection's first cell
    * (`max(floorDiv(aLo), floorDiv(bLo))`) — the standard duplicate-free
    * spatial-join trick, no distinct pass over the output. */
  def intervalOverlap(left: DataFrame, leftLo: String, leftHi: String,
                      right: DataFrame, rightLo: String, rightHi: String,
                      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def cells(df: DataFrame, lo: String, hi: String) = df.withColumn("_bucket",
      explode(when(col(lo) <= col(hi),
        sequence(floorDiv(col(lo), bucketWidth), floorDiv(col(hi), bucketWidth)))
        .otherwise(array().cast("array<long>"))))
    cells(left, leftLo, leftHi)
      .join(cells(right, rightLo, rightHi), Seq("_bucket") ++ keyCols)
      .where(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
        col("_bucket") === greatest(floorDiv(col(leftLo), bucketWidth),
          floorDiv(col(rightLo), bucketWidth)))
      .drop("_bucket")
  }
}
