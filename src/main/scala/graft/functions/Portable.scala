package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic, engine-portable primitives shared by the dedup / similarity
  * / text operators.
  *
  * Everything here is chosen so an independent SQL engine (the correctness
  * oracle) can reproduce results bit-for-bit:
  *  - `hash60` = first 60 bits (big-endian) of md5, as a non-negative BIGINT —
  *    the same value as `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)`.
  *    md5 is stable across platforms, 60 bits always fits a signed long.
  *  - word shingles are plain space-joined word k-grams over `split(text,' ')`.
  *
  * All expressions are built from codegen'd built-ins (no UDFs), so they stay
  * inside whole-stage codegen on the 100 TB path.
  */
object Portable {

  /** First 60 bits of md5(utf8(c)) as a non-negative long. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash families from one md5 core. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed:"), c))

  /** The DuckDB-SQL text of [[hash60]] for oracle generation. */
  def hash60Sql(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"

  def hash60Sql(seed: Int, expr: String): String =
    hash60Sql(s"concat('$seed:', $expr)")

  /** Whitespace word tokens (documents.text is single-space separated). */
  def words(text: Column): Column = split(text, " ")

  /** Word k-gram shingles: `size-k+1` space-joined k-grams, empty array when
    * the doc has fewer than k words. The dedup unit everywhere (order-aware,
    * unlike raw token sets, which degenerate on small vocabularies). */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = words(text)
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k), i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))))
      .otherwise(array().cast("array<string>"))
  }

  /** DuckDB-SQL for [[wordShingles]] over column `text` (1-based lists). */
  def wordShinglesSql(k: Int): String = {
    val terms = (0 until k).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"CASE WHEN len(toks) >= $k THEN list_transform(range(1, len(toks) - ${k - 2}), i -> $terms) ELSE [] END"
  }
}
