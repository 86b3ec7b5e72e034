package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-curve layout: known interleaving values, and the property that pays at
  * 100 TB — z-ordered files have tight min/max stats on EVERY interleaved
  * dimension, where a lexicographic sort is tight only on its prefix. */
class LayoutSpec extends SparkTestBase {

  test("zValue interleaves bits (column 0 least significant)") {
    // x=0b11, y=0b01, 2 bits: z = x0 | y0<<1 | x1<<2 | y1<<3 = 0b0111
    val row = spark.range(1).select(
      Layout.zValue(Seq(lit(3), lit(1)), bits = 2).as("z")).collect().head
    assert(row.getLong(0) == 7L)
    // identity: 1 column, interleave = the value itself
    val id = spark.range(100).select(col("id"),
      Layout.zValue(Seq(col("id")), bits = 7).as("z"))
      .where(col("id") =!= col("z")).count()
    assert(id == 0L)
  }

  test("z-order write keeps per-file spans tight on BOTH dimensions") {
    val n = 64
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("a"), (col("id") / n).cast("long").as("b"))

    def perFileSpan(df: org.apache.spark.sql.DataFrame, dim: String): Double = {
      val dir = tmpDir("layout-")
      df.write.mode("overwrite").parquet(dir)
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name()).agg((max(dim) - min(dim)).as("span"))
        .collect().map(_.getLong(1))
      spans.sum.toDouble / spans.length
    }

    val zed = Layout.zOrderBy(grid, Seq(col("a"), col("b")), numPartitions = 16,
      bits = 6).drop("z_value")
    val lex = grid.repartitionByRange(16, col("a"))
      .sortWithinPartitions(col("a"), col("b"))

    val zSpanB = perFileSpan(zed, "b")
    val lexSpanB = perFileSpan(lex, "b")
    // lexicographic files cover b's whole domain (~63); z-ordered files cover
    // a quadrant-sized band — assert at least a 2x tightening
    assert(lexSpanB > 40, s"lex b-span $lexSpanB should be ~full domain")
    assert(zSpanB * 2 < lexSpanB, s"z b-span $zSpanB vs lex $lexSpanB")
    // and the z layout stays reasonable on a too
    val zSpanA = perFileSpan(zed, "a")
    assert(zSpanA * 2 < lexSpanB, s"z a-span $zSpanA vs lex b-span $lexSpanB")
  }
}
