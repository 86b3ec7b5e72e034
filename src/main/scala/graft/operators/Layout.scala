package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the scan you never run is the fastest one: Parquet row-group /
  * file skipping works off min/max statistics, and a lexicographic sort gives
  * tight stats only on its leading column. Interleaving the bits of several
  * columns into one Morton (Z-curve) value and range-sorting by it keeps
  * every interleaved column's per-file span narrow, so predicates on ANY of
  * the dimensions prune — the mechanism behind Delta's OPTIMIZE ZORDER and
  * the classic UB-tree layout, exposed here as a plain column + a
  * repartitionByRange the caller can feed any writer (including
  * [[graft.eslog.EsLog.append]]'s sortKey).
  */
object Layout {

  /** Morton (Z-curve) value: interleave the low `bits` bits of each column,
    * column 0 in the least-significant position of each bit group. Inputs
    * must be non-negative integers — bucket or bitmask wider/continuous
    * domains first (`col.bitwiseAND(65535)`, day numbers, quantile ids).
    * `bits * cols.size` must fit a positive long (<= 62). Pure integer
    * shift/mask arithmetic: codegen'd by Spark and reproducible by any SQL
    * engine ([[zValueSql]] emits the identical expression). */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits=$bits over ${cols.size} cols must stay within a positive long")
    val n = cols.size
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ + _)
  }

  /** The SQL text of [[zValue]] over expression strings — for oracles and
    * engine-portable pipelines. Every term is fully parenthesized (shift
    * binds looser than '+' in C-style grammars). */
  def zValueSql(exprs: Seq[String], bits: Int = 16): String = {
    require(exprs.nonEmpty && bits > 0 && bits * exprs.size <= 62)
    val n = exprs.size
    (for { i <- 0 until bits; (e, j) <- exprs.zipWithIndex }
      yield s"(((($e) >> $i) & 1) << ${i * n + j})").mkString(" + ")
  }

  /** Cluster rows for multi-dimensional pruning: add the `z_value` column,
    * range-partition by it into `numPartitions` output units and sort within
    * partitions — one shuffle, no global single-partition sort. Writing the
    * result (one file per partition) yields files whose min/max stats are
    * tight on EVERY interleaved dimension. */
  def zOrderBy(df: DataFrame, cols: Seq[Column], numPartitions: Int,
               bits: Int = 16): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    df.withColumn("z_value", zValue(cols, bits))
      .repartitionByRange(numPartitions, col("z_value"))
      .sortWithinPartitions(col("z_value"))
  }
}
