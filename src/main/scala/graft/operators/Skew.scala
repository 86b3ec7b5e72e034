package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * When one join key carries a disproportionate share of the left (fact)
  * side, a plain shuffle join lands that key's entire volume on one reducer.
  * [[saltedJoin]] spreads it: the fact side gets a deterministic salt in
  * [0, buckets) derived from its own row content, the dimension side is
  * replicated once per salt value, and the join key becomes (key, salt) — so
  * the hot key fans out over `buckets` reducers. Output is exactly the plain
  * inner join (the salt never leaks). AQE's skew-join handles moderate skew
  * automatically; explicit salting is the tool for the pathological keys a
  * 100 TB pipeline meets (null-ish ids, default values, bot traffic).
  */
object Skew {

  /** Inner equi-join of `fact` and `dim` on `keys`, salted `buckets` ways.
    * `saltFrom` are fact-side columns whose hash spreads the hot keys —
    * pick high-cardinality ones (they need not be distinct per row). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 buckets: Int, saltFrom: Seq[String]): DataFrame = {
    require(buckets > 0 && keys.nonEmpty && saltFrom.nonEmpty)
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(saltFrom.map(col): _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    val cond = (keys.map(k => salted(k) === replicated(k)) :+
      (salted("_salt") === replicated("_salt"))).reduce(_ && _)
    val joined = salted.join(replicated, cond)
      .drop(replicated("_salt")).drop(salted("_salt"))
    keys.foldLeft(joined)((d, k) => d.drop(replicated(k)))
  }
}
