package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-statistics operators with engine-exact output: discrete quantiles
  * and fixed-width histograms. Both are single-shuffle plans whose results
  * are integers or existing input values — no interpolation, no floats
  * manufactured by the engine — so an independent SQL engine reproduces
  * them bit-for-bit.
  */
object Stats {

  /** Exact per-group DISCRETE quantiles: for each requested permille p, the
    * value at sorted rank `floor((n-1) * p / 1000)` — an existing input
    * value (type-preserving), the `percentile_disc` rule. Duplicate values
    * make the rank→value mapping well-defined regardless of their internal
    * order, so the result is deterministic with no tie-break column.
    *
    * Plan: ONE hash shuffle on the group key + per-group sort (the
    * sort-merge shape), ranks and counts from the same window pass, then a
    * per-row rank-set FILTER over the permille array before the explode —
    * only matching (row, permille) pairs materialize, never |permille| rows
    * per input row. No second aggregate, no driver work. For sketch-based
    * approximate quantiles at extreme group sizes see
    * [[graft.operators.Sketch]] / Spark's own `percentile_approx`; this
    * operator is the exact, portable form. */
  def quantilesDisc(df: DataFrame, groupCols: Seq[String], valueCol: String,
                    permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 0 && p <= 1000),
      "permille values must be in [0, 1000]")
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col(valueCol).asc)
    val wAll = Window.partitionBy(grp: _*)
    val permilleArr = array(permille.distinct.sorted.map(p => lit(p.toLong)): _*)
    df.select(grp :+ col(valueCol): _*)
      .withColumn("_rn", row_number().over(w).cast("long") - 1)
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("permille", explode(filter(permilleArr,
        p => col("_rn") === call_function("div", (col("_n") - 1) * p, lit(1000L)))))
      .select(grp :+ col("permille") :+ col(valueCol).as("q_value"): _*)
  }

  /** Fixed-width integer histogram per group: bucket = floor(value / width)
    * over an integral column, one hash aggregate with map-side combine.
    * Emits only non-empty buckets (join a bucket spine downstream for dense
    * output). */
  def histogram(df: DataFrame, groupCols: Seq[String], valueCol: String,
                width: Long): DataFrame = {
    require(width > 0, "width must be positive")
    val grp = groupCols.map(col)
    df.select(grp :+ RangeJoin.floorDiv(col(valueCol).cast("long"), width).as("bucket"): _*)
      .groupBy(grp :+ col("bucket"): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", col("bucket") * width)
  }

  /** Merge shard histograms built with identical (groupCols, width):
    * bucket-wise sum — the histogram merge law (a merged histogram is
    * bit-identical to the histogram of the union; unit-pinned). Build per
    * shard/day/source, persist the tiny grids, merge on demand — same
    * deployment shape as [[Sketch.cmsMerge]]. */
  def histogramMerge(shards: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(shards.nonEmpty, "need at least one histogram")
    val grp = groupCols.map(col)
    shards.reduce(_.unionByName(_))
      .groupBy(grp :+ col("bucket") :+ col("bucket_lo"): _*)
      .agg(sum("n").as("n"))
      .select(grp :+ col("bucket") :+ col("n") :+ col("bucket_lo"): _*)
  }

  /** MERGEABLE approximate quantiles — the 100 TB percentile path that
    * [[quantilesDisc]]'s exact per-group sort is not: quantiles read off a
    * fixed-width [[histogram]] (possibly [[histogramMerge]]d across shards).
    * For each permille p, emits the lower bound of the bucket holding the
    * rank-`floor((n-1)p/1000)` value — a deterministic integer within
    * `width` below the exact discrete quantile (`q_lo <= exact < q_lo +
    * width`, unit-pinned), reproducible bit-for-bit by any SQL engine.
    *
    * State is bounded by the bucket count, never the row count: the
    * histogram is one map-side-combined aggregate, and this read is a
    * window over (group × non-empty buckets) — at a value range of 10^6 and
    * width 50 that is 20k rows per group REGARDLESS of whether the group
    * holds 10^3 or 10^12 values. */
  /** Bounded-state approximate quantiles over an UNBOUNDED value domain —
    * the case [[quantilesFromHistogram]] (which needs a known range/width)
    * cannot cover. Per group, a bottom-k-by-hash uniform row sample
    * ([[org.apache.spark.sql.graftshim.QuantileSampleAgg]]: the k smallest
    * distinct `(hash60(rowKey), value)` pairs — order-independent,
    * mergeable by union-and-trim like KMV, ≤ k pairs of state per group per
    * partition, map-side partials), then each permille p reads the sampled
    * value at integer rank `(n-1)p div 1000`. Deterministic end-to-end: the
    * retained sample is a pure function of the input multiset, so an
    * independent SQL engine reproduces it bit-for-bit
    * (`DISTINCT h, v ORDER BY h, v LIMIT k` + the same rank rule).
    * Rank error is the standard O(1/sqrt(k)) sample-quantile bound.
    *
    * `rowKey` must identify rows uniquely (duplicate keys collapse — same
    * contract as `sampleKPerGroup`); duplicate VALUES from distinct rows
    * are preserved (their hashes differ), as a quantile sample requires.
    * `value` is cast to long — pre-round fractional columns explicitly
    * (e.g. `round(price * 100)` for cents): a raw double cast truncates,
    * which an independent SQL engine may round instead. */
  def quantilesSample(df: DataFrame, groupCols: Seq[String], rowKey: Column,
                      value: Column, k: Int, permille: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShims, QuantileSampleAgg}
    require(k >= 2, "k must be at least 2")
    require(permille.nonEmpty && permille.forall(p => p >= 0 && p <= 1000),
      "permille values must be in [0, 1000]")
    val grp = groupCols.map(col)
    val kept = GraftShims.column(QuantileSampleAgg(
      GraftShims.expr(graft.functions.Portable.hash60(rowKey)),
      GraftShims.expr(value.cast("long")), k).toAggregateExpression())
    val permilleArr = array(permille.distinct.sorted.map(p => lit(p.toLong)): _*)
    OpUtil.rebalance(df).groupBy(grp: _*).agg(kept.as("_vals"))
      .withColumn("permille", explode(permilleArr))
      .select(grp :+ col("permille") :+
        sampleQuantileRead(col("_vals"), col("permille")).as("q_value"): _*)
  }

  /** THE integer-rank read off an ascending sample array: permille p → the
    * element at rank `(n-1)·p div 1000` (null on an empty sample). The one
    * canonical encoding of the rule — [[quantilesSample]] and the streaming
    * fixture share it, and the SQL oracles mirror it. */
  def sampleQuantileRead(vals: Column, permille: Column): Column =
    when(size(vals) > 0, element_at(vals,
      (call_function("div",
        (size(vals).cast("long") - 1L) * permille, lit(1000L)) + 1L).cast("int")))

  def quantilesFromHistogram(hist: DataFrame, groupCols: Seq[String],
                             permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(p => p >= 0 && p <= 1000),
      "permille values must be in [0, 1000]")
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("bucket").asc)
    val wAll = Window.partitionBy(grp: _*)
    val permilleArr = array(permille.distinct.sorted.map(p => lit(p.toLong)): _*)
    // rank r = (n-1)p div 1000 falls in THIS bucket iff cum-n <= r < cum
    hist.withColumn("_cum", sum(col("n")).over(w))
      .withColumn("_tot", sum(col("n")).over(wAll))
      .withColumn("permille", explode(filter(permilleArr, p => {
        val r = call_function("div", (col("_tot") - 1) * p, lit(1000L))
        (col("_cum") - col("n")) <= r && r < col("_cum")
      })))
      .select(grp :+ col("permille") :+ col("bucket_lo").as("q_lo"): _*)
  }
}
