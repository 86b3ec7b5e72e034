package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Mergeable sketches for corpus-scale profiling — distinct counting (KMV)
  * and frequency estimation / heavy hitters (count-min) — built on the
  * engine-portable md5 hash family in [[Portable]], so every estimate is a
  * DETERMINISTIC integer any SQL engine reproduces bit-for-bit (unlike
  * HLL++/datasketches binaries, which are implementation-defined).
  *
  * Both sketches are algebraic, the property that matters at 100 TB:
  *  - a KMV sketch of a union is the k smallest of the union of the two
  *    sketches' hash sets (partial sketches merge on executors, map-side);
  *  - a CMS is a counter grid — sketches of shards merge by cell-wise sum.
  * Unit tests assert both merge laws; the estimates come with the standard
  * guarantees (KMV relative error ~ 1/√(k−2); CMS overestimates only, by at
  * most εN with ε = e/width at the usual depth).
  */
object Sketch {

  /** Hash space of [[Portable.hash60]]: [0, 2^60). */
  val HashSpace: Long = 1L << 60

  /** KMV (k-minimum-values) distinct-count sketch per group: the k smallest
    * DISTINCT `hash60` values of `valueCol`, summarized per group as
    * `(n_kept, kth_hash, n_distinct_est)`.
    *
    * Estimator (all BIGINT, overflow-free by construction: `kth >= k-1`
    * because hashes are distinct non-negative integers, so the product is
    * at most 2^60): `est = n_kept` when the group holds fewer than k
    * distinct values (the sketch is exact), else
    * `(k-1) * (HashSpace div kth_hash)`.
    *
    * Plan shape: hash values first (8-byte keys), dedupe on (group, hash) —
    * the shuffle carries distinct hashes, never raw occurrences — then one
    * per-group ordered window keeps the k minima. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], value: Column,
                  k: Int = 64): DataFrame =
    kmvFromKept(kmvKeptHashes(df, groupCols, value, k), groupCols, k)

  /** [[kmvDistinct]] executed through the bounded-state
    * [[org.apache.spark.sql.graftshim.KmvAgg]] aggregate — the 100 TB path.
    * The declarative twin shuffles EVERY distinct hash and window-sorts each
    * group; this one holds ≤ k longs per group per partition, partials merge
    * map-side (ObjectHashAggregate, plan-audited), and the shuffle carries
    * ≤ k longs per (group, partition). Bit-identical output (k-minima are
    * order-insensitive; unit-pinned against the window twin). */
  def kmvDistinctAgg(df: DataFrame, groupCols: Seq[String], value: Column,
                     k: Int = 64): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShims, KmvAgg}
    require(k >= 2, "k must be at least 2")
    val grp = groupCols.map(col)
    val kept = GraftShims.column(
      KmvAgg(GraftShims.expr(Portable.hash60(value)), k).toAggregateExpression())
    OpUtil.rebalance(df).groupBy(grp: _*).agg(kept.as("_ks"))
      .withColumn("n_kept", size(col("_ks")).cast("long"))
      .withColumn("kth_hash", when(col("n_kept") > 0,
        element_at(col("_ks"), size(col("_ks")))))
      .withColumn("n_distinct_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(lit((k - 1).toLong) * call_function("div", lit(HashSpace), col("kth_hash"))))
      .drop("_ks")
  }

  /** The sketch ITSELF as data: per group, the k smallest distinct hashes as
    * `(groupCols..., _h)` rows — persist these per shard/partition and merge
    * later with [[kmvFromKept]]; a merged sketch is bit-identical to the
    * sketch of the union (unit-tested merge law). */
  def kmvKeptHashes(df: DataFrame, groupCols: Seq[String], value: Column,
                    k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val grp = groupCols.map(col)
    // rebalance: a few-MB single-partition input would run the whole
    // hash+dedupe pipeline on one core (no-op at cluster scale)
    val hashed = OpUtil.rebalance(df)
      .select(grp :+ Portable.hash60(value).as("_h"): _*).distinct()
    val w = Window.partitionBy(grp: _*).orderBy(col("_h").asc)
    hashed.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .drop("_rn")
  }

  /** [[kmvKeptHashes]] executed through the bounded-state
    * [[org.apache.spark.sql.graftshim.KmvAgg]] aggregate — the 100 TB path
    * for building the sketch-as-data table (the [[kmvDistinctAgg]] reasoning
    * applied to kept hashes): the declarative twin shuffles EVERY distinct
    * hash and window-sorts each group in full; this one holds ≤ k longs per
    * group per partition and map-side partial-aggregates, then explodes the
    * ascending kept array back to rows. The kept SET is exactly the k
    * smallest distinct hashes either way (unit-pinned against the window
    * twin), so downstream [[kmvOverlap]] / [[kmvFromKept]] results are
    * bit-identical. */
  def kmvKeptHashesAgg(df: DataFrame, groupCols: Seq[String], value: Column,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShims, KmvAgg}
    require(k >= 2, "k must be at least 2")
    val grp = groupCols.map(col)
    val kept = GraftShims.column(
      KmvAgg(GraftShims.expr(Portable.hash60(value)), k).toAggregateExpression())
    OpUtil.rebalance(df).groupBy(grp: _*).agg(kept.as("_ks"))
      .select(grp :+ explode(col("_ks")).as("_h"): _*)
  }

  /** Finalize (or merge) kept-hash rows into the per-group summary. Input may
    * be a UNION of shard sketches: hashes shared by shards dedupe, then the
    * k smallest survive — exactly the KMV union rule. */
  def kmvFromKept(kept: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*).orderBy(col("_h").asc)
    kept.distinct()
      .withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .groupBy(grp: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("kth_hash"))
      .withColumn("n_distinct_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(lit((k - 1).toLong) * call_function("div", lit(HashSpace), col("kth_hash"))))
  }

  /** The [[kmvDistinct]] estimator in DuckDB SQL, for oracle generation:
    * `valueExpr` must be the DISTINCT per-group value rows. */
  def kmvDistinctSql(k: Int, fromDistinct: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH hashed AS (SELECT DISTINCT $g, ${Portable.hash60Sql("v")} AS h FROM ($fromDistinct)),
       |rk AS (SELECT $g, h, row_number() OVER (PARTITION BY $g ORDER BY h) AS rn FROM hashed)
       |SELECT $g, count(*) AS n_kept, max(h) AS kth_hash,
       |       CASE WHEN count(*) < $k THEN count(*)
       |            ELSE ${k - 1} * ($HashSpace // max(h)) END AS n_distinct_est
       |FROM rk WHERE rn <= $k GROUP BY $g""".stripMargin
  }

  /** Set-overlap estimates from two KMV kept-hash sketches (the theta-sketch
    * role: intersection / Jaccard WITHOUT touching the raw sets — compare
    * yesterday's corpus sketch against today's crawl sketch in milliseconds).
    * Inputs are [[kmvKeptHashes]] tables keyed by the same `groupCols`;
    * per group the k smallest hashes of the UNION are taken (that is the
    * union's KMV sketch, so the distinct estimator applies), and within
    * those survivors `n_both` counts hashes present in BOTH sides — a
    * uniform sample of the union, so `n_both / n_kept` estimates the
    * Jaccard similarity (the classic KMV coincidence estimator).
    *
    * Everything emitted is a deterministic BIGINT, bit-reproducible in SQL:
    * `jaccard_permille = 1000·n_both div n_kept`, `n_union_est` the standard
    * KMV estimate, `n_inter_est = n_union_est·n_both div n_kept`. Exact when
    * both groups hold < k distinct values (the sketches are then complete
    * sets). Plan shape: two bounded sketch tables (≤ k rows per group per
    * side) union + one windowed rank — never the raw data. */
  def kmvOverlap(keptA: DataFrame, keptB: DataFrame, groupCols: Seq[String],
                 k: Int): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val grp = groupCols.map(col)
    val a = keptA.select(grp :+ col("_h"): _*).withColumn("_in_a", lit(1)).withColumn("_in_b", lit(0))
    val b = keptB.select(grp :+ col("_h"): _*).withColumn("_in_a", lit(0)).withColumn("_in_b", lit(1))
    val both = a.unionByName(b)
      .groupBy(grp :+ col("_h"): _*)
      .agg(max(col("_in_a")).as("_a"), max(col("_in_b")).as("_b"))
    val w = Window.partitionBy(grp: _*).orderBy(col("_h").asc)
    val kept = both.withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
    kept.groupBy(grp: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("kth_hash"),
        sum(when(col("_a") === 1 && col("_b") === 1, 1L).otherwise(0L)).as("n_both"))
      .withColumn("n_union_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(lit((k - 1).toLong) * call_function("div", lit(HashSpace), col("kth_hash"))))
      .withColumn("jaccard_permille",
        call_function("div", lit(1000L) * col("n_both"), col("n_kept")))
      // floor(U·B/K) computed as (U div K)·B + ((U mod K)·B) div K — the
      // exact same integer, but overflow-free: U ≤ 2^60 and B ≤ K bound the
      // first term by 2^60 and the second by k², where the naive product
      // U·B can pass 2^63 at large cardinalities
      .withColumn("n_inter_est",
        call_function("div", col("n_union_est"), col("n_kept")) * col("n_both") +
          call_function("div", (col("n_union_est") % col("n_kept")) * col("n_both"),
            col("n_kept")))
      .drop("kth_hash")
  }

  /** The [[kmvOverlap]] estimator in DuckDB SQL: `fromA` / `fromB` supply
    * per-group DISTINCT value rows as `($groupCols..., v)`. */
  def kmvOverlapSql(k: Int, fromA: String, fromB: String,
                    groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""WITH ha AS (SELECT DISTINCT $g, ${Portable.hash60Sql("v")} AS h FROM ($fromA)),
       |hb AS (SELECT DISTINCT $g, ${Portable.hash60Sql("v")} AS h FROM ($fromB)),
       |ka AS (SELECT $g, h FROM (SELECT $g, h, row_number() OVER (PARTITION BY $g ORDER BY h) AS rn FROM ha) WHERE rn <= $k),
       |kb AS (SELECT $g, h FROM (SELECT $g, h, row_number() OVER (PARTITION BY $g ORDER BY h) AS rn FROM hb) WHERE rn <= $k),
       |u AS (SELECT $g, h, max(ia) AS a, max(ib) AS b FROM (
       |        SELECT $g, h, 1 AS ia, 0 AS ib FROM ka
       |        UNION ALL SELECT $g, h, 0 AS ia, 1 AS ib FROM kb)
       |      GROUP BY ALL),
       |rk AS (SELECT $g, h, a, b, row_number() OVER (PARTITION BY $g ORDER BY h) AS rn FROM u),
       |agg AS (SELECT $g, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth_hash,
       |               CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
       |        FROM rk WHERE rn <= $k GROUP BY $g),
       |est AS (SELECT $g, n_kept, n_both,
       |               CASE WHEN n_kept < $k THEN n_kept
       |                    ELSE ${k - 1} * ($HashSpace // kth_hash) END AS n_union_est
       |        FROM agg)
       |SELECT $g, n_kept, n_both, n_union_est,
       |       (1000 * n_both) // n_kept AS jaccard_permille,
       |       (n_union_est // n_kept) * n_both
       |         + ((n_union_est % n_kept) * n_both) // n_kept AS n_inter_est
       |FROM est""".stripMargin
  }

  /** HyperLogLog register sketch per group — the fourth canonical mergeable
    * sketch beside KMV/CMS/Bloom, and the one real catalogs standardize on
    * for cardinality. Registers as SPARSE rows `(groupCols..., bucket, rho)`:
    * bucket = the hash's top `p` bits, rho = 1 + leading-zero count of the
    * remaining `w = 60 - p` bits, register value = max rho seen. At most
    * `m = 2^p` rows per group regardless of input; an absent bucket is
    * register 0, exactly like the sparse Bloom/CMS forms.
    *
    * Everything is INTEGER and engine-portable: rho derives from the bit
    * length of the suffix (`length(bin(suffix))`, exact in any engine — no
    * float log), so a register table reproduces bit-for-bit in SQL, unlike
    * HLL++/datasketches binaries. The float estimator lives separately in
    * [[hllEstimate]] (unit-tested against exact counts); the registers ARE
    * the sketch and merge by per-bucket max ([[hllMerge]], law unit-pinned).
    *
    * Plan shape: one projection + one hash aggregate — partial maxes combine
    * map-side, so the shuffle carries ≤ m rows per group per partition. */
  def hllSketch(df: DataFrame, groupCols: Seq[String], value: Column,
                p: Int = 10): DataFrame = {
    val grp = groupCols.map(col)
    val (bucket, rho) = hllCells(value, p)
    OpUtil.rebalance(df)
      .select(grp :+ bucket.as("bucket") :+ rho.as("_rho"): _*)
      .where(col("bucket").isNotNull) // null values sketch nothing (= the agg twin)
      .groupBy(grp :+ col("bucket"): _*)
      .agg(max(col("_rho")).as("rho"))
  }

  /** The (bucket, rho) derivation shared by [[hllSketch]] and its streaming
    * twin — one definition, so batch and micro-batch registers are bit-equal
    * by construction. */
  def hllCells(value: Column, p: Int): (Column, Column) = {
    require(p >= 2 && p <= 20, s"p must be in [2, 20]; got $p")
    val w = 60 - p
    val suffixSpace = 1L << w
    val h = Portable.hash60(value)
    val bucket = call_function("div", h, lit(suffixSpace))
    val suffix = h % suffixSpace
    // bit length of x>0 is length(bin(x)); rho = w - bitlen + 1, or w + 1
    // for an all-zero suffix
    val rho = when(suffix === 0, lit(w + 1).cast("long"))
      .otherwise(lit(w + 1).cast("long") - length(bin(suffix)).cast("long"))
    (bucket, rho)
  }

  /** [[hllSketch]] executed through the bounded-state
    * [[org.apache.spark.sql.graftshim.HllAgg]] aggregate — the 100 TB path.
    * The declarative twin shuffles up to `2^p` sparse register rows per
    * group per partition; this one holds exactly `2^p` BYTES per group,
    * partials merge map-side by register-wise max (ObjectHashAggregate),
    * and the shuffle carries one register array per (group, partition).
    * Output is the same sparse `(groupCols..., bucket, rho)` row form,
    * bit-identical to [[hllSketch]] (max is order-insensitive; unit-pinned). */
  def hllSketchAgg(df: DataFrame, groupCols: Seq[String], value: Column,
                   p: Int = 10): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShims, HllAgg}
    val grp = groupCols.map(col)
    val regs = GraftShims.column(
      HllAgg(GraftShims.expr(Portable.hash60(value)), p).toAggregateExpression())
    OpUtil.rebalance(df).groupBy(grp: _*).agg(regs.as("_regs"))
      // explicit generator aliases: posexplode's default (pos, col) names
      // would collide with group columns so named
      .select(grp :+ posexplode(col("_regs")).as(Seq("__hll_bucket", "__hll_rho")): _*)
      .where(col("__hll_rho") > 0)
      .select(grp :+ col("__hll_bucket").cast("long").as("bucket")
        :+ col("__hll_rho").cast("long").as("rho"): _*)
  }

  /** Merge shard HLL register tables built with identical `p`: per-bucket
    * max — the HLL merge law (the sparse form of register-wise max). The
    * merged table is bit-identical to sketching the union. */
  def hllMerge(sketches: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    val keys = groupCols :+ "bucket"
    sketches.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*).agg(max("rho").as("rho"))
  }

  /** Cardinality estimate from a register table: the classic HLL estimator
    * with the small-range linear-counting correction. Floats enter ONLY
    * here — `alpha·m² / Σ 2^(−rho)` over all m registers (absent buckets
    * contribute 2^0), switching to `m·ln(m/V)` when the raw estimate is
    * under 2.5m and V = zero registers > 0. Deterministic given the
    * registers, but implementation-defined at the ULP level — oracle rows
    * pin the REGISTERS; accuracy is unit-tested against exact counts. */
  def hllEstimate(sketch: DataFrame, groupCols: Seq[String], p: Int): DataFrame = {
    val m = 1L << p
    val alpha = m match {
      case 4L => 0.673
      case 8L => 0.697
      case 16L => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val grp = groupCols.map(col)
    val agg = sketch.groupBy(grp: _*).agg(
      count(lit(1)).as("n_set"),
      sum(pow(lit(2.0), -col("rho"))).as("_sum_set"))
    val sumInv = col("_sum_set") + (lit(m.toDouble) - col("n_set")) // absents at 2^0
    val zeros = lit(m.toDouble) - col("n_set")
    val raw = lit(alpha * m * m) / sumInv
    agg.withColumn("n_distinct_est",
        when(raw <= lit(2.5 * m) && zeros > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / zeros))
          .otherwise(raw))
      .drop("_sum_set")
  }

  /** The [[hllSketch]] register table in DuckDB SQL, for oracle generation:
    * `from` supplies per-group value rows as `($groupCols..., v)`. */
  def hllSketchSql(p: Int, from: String, groupCols: Seq[String]): String = {
    val w = 60 - p
    val suffixSpace = 1L << w
    val g = groupCols.mkString(", ")
    s"""WITH hh AS (SELECT $g, ${Portable.hash60Sql("v")} AS h FROM ($from)
       |           WHERE v IS NOT NULL),
       |rr AS (SELECT $g, h // $suffixSpace AS bucket,
       |         CASE WHEN h % $suffixSpace = 0 THEN ${w + 1}
       |              ELSE ${w + 1} - length(bin(h % $suffixSpace)) END AS rho
       |       FROM hh)
       |SELECT $g, bucket, CAST(max(rho) AS BIGINT) AS rho FROM rr GROUP BY ALL""".stripMargin
  }

  /** Count-min sketch over `valueCol` occurrences: a depth × width counter
    * grid as rows `(d, slot, cnt)` — cell `(i, uhash_i(h) mod width)` counts
    * every occurrence hashing there. Cells merge across shards by sum. One
    * explode (depth rows per occurrence) + one hash aggregate; the result is
    * `depth × width` rows regardless of input size. */
  def cmsSketch(df: DataFrame, value: Column, depth: Int = 4,
                width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2)
    val hm = Portable.uhashBase(value)
    OpUtil.rebalance(df).select(explode(array((0 until depth).map(i =>
        struct(lit(i).as("d"), (Portable.uhash(i, hm) % width).as("slot"))): _*)).as("cell"))
      .groupBy(col("cell.d").as("d"), col("cell.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge shard sketches built with identical (depth, width): cell-wise sum
    * — the CMS merge law (unit-pinned equal to sketching the union). Build
    * per shard/day/source, persist the tiny grids, merge on demand. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_.unionByName(_)).groupBy("d", "slot").agg(sum("cnt").as("cnt"))
  }

  /** [[cmsSketch]] built from PRE-AGGREGATED occurrence counts `(value,
    * cnt)` rows — bit-identical to sketching the raw occurrences (a cell's
    * count is the sum of its values' occurrence counts; unit-pinned in
    * JoinOpsSpec), for callers that already hold per-value counts: the md5
    * slot family then derives once per DISTINCT value instead of once per
    * occurrence, and no second corpus pass is paid (r18, §1.2 step 1 /
    * §2.3 aggregate-before-shuffle). */
  def cmsSketchFromCounts(counts: DataFrame, value: Column, cnt: Column,
                          depth: Int = 4, width: Int = 1024): DataFrame = {
    require(depth >= 1 && width >= 2)
    val hm = Portable.uhashBase(value)
    OpUtil.rebalance(counts)
      .select(explode(array((0 until depth).map(i =>
          struct(lit(i).as("d"), (Portable.uhash(i, hm) % width).as("slot"))): _*)).as("cell"),
        cnt.as("_c"))
      .groupBy(col("cell.d").as("d"), col("cell.slot").as("slot"))
      .agg(sum(col("_c")).as("cnt"))
  }

  /** Bloom membership sketch: each DISTINCT value sets `k` slot indices in
    * `[0, m)` (the [[Portable.uhash]] family); the sketch is the distinct
    * set-slot rows `(slot)` — at most `min(m, n_distinct * k)` rows
    * REGARDLESS of input size, and sparse exactly like a real bit array.
    * Shard sketches built with identical `(m, k)` merge by UNION DISTINCT
    * ([[bloomMerge]], law unit-pinned): the merged sketch is bit-identical
    * to sketching the union — build per shard/day/source, persist the tiny
    * slot tables, merge on demand. Membership ([[bloomProbe]]) has NO false
    * negatives; false positives ~ `(1 - e^(-kn/m))^k`, the classic bound.
    * The 100 TB use case is decontamination/membership at billions of keys:
    * probe a benchmark set against a corpus WITHOUT joining the corpus. */
  def bloomSketch(df: DataFrame, value: Column, m: Int = 1 << 20,
                  k: Int = 5): DataFrame = {
    require(m >= 2 && k >= 1)
    OpUtil.rebalance(df)
      .select(explode(bloomSlots(value, m, k)).as("slot"))
      .distinct()
  }

  /** The k slot indices one value sets, as an array column — the single
    * definition of the Bloom cell rule, shared by [[bloomSketch]],
    * [[bloomProbe]] and shard-tagged builders (e.g. a one-pass build of
    * several parity-shard sketches). */
  def bloomSlots(value: Column, m: Int = 1 << 20, k: Int = 5): Column = {
    require(m >= 2 && k >= 1)
    val hm = Portable.uhashBase(value)
    array((0 until k).map(i => Portable.uhash(i, hm) % m): _*)
  }

  /** Merge shard Bloom sketches built with identical (m, k): union of set
    * slots — the Bloom merge law (bitwise OR on the dense form). */
  def bloomMerge(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "need at least one sketch")
    sketches.reduce(_.unionByName(_)).distinct()
  }

  /** Membership probe: for each candidate row, `maybe_present` = all `k` of
    * its slots are set. The sketch side is ≤ `m` rows, so the join
    * broadcasts; at corpus scale persist the sketch as a table and the
    * probe is a plain equi-join on `slot`. Never a false negative — the
    * check is "no probed cell MISSED the sketch" (zero unmatched rows after
    * the left join), which stays exact when candidates contain duplicate
    * rows (duplicates multiply matched AND unmatched rows alike; a
    * matched-row count vs `k` would not survive that) and when two of a
    * value's `k` hash functions collide on one slot. */
  def bloomProbe(candidates: DataFrame, value: Column, sketch: DataFrame,
                 m: Int = 1 << 20, k: Int = 5): DataFrame = {
    val cells = candidates.withColumn("slot", explode(bloomSlots(value, m, k)))
    cells.join(broadcast(sketch.withColumn("_set", lit(1))), Seq("slot"), "left")
      .groupBy(candidates.columns.toIndexedSeq.map(col): _*)
      .agg((count(when(col("_set").isNull, lit(1))) === 0).as("maybe_present"))
  }

  /** Point-frequency estimates from a [[cmsSketch]]: for each candidate row,
    * `est = min` over the depth cells its value hashes to — the classic CMS
    * read, never an underestimate. The sketch side is `depth × width` rows,
    * so the join broadcasts regardless of corpus size. The join is a LEFT
    * join with absent cells counted 0: a persisted/merged shard sketch is
    * sparse (cells nobody hashed to are simply missing rows), so a candidate
    * absent from the sketched corpus estimates 0 — and still produces a row —
    * rather than being silently dropped, and a partially-absent candidate's
    * min runs over all `depth` cells. */
  def cmsEstimate(candidates: DataFrame, value: Column, sketch: DataFrame,
                  depth: Int = 4, width: Int = 1024): DataFrame = {
    val hm = Portable.uhashBase(value)
    val cells = candidates.withColumn("cell", explode(array((0 until depth).map(i =>
      struct(lit(i).as("d"), (Portable.uhash(i, hm) % width).as("slot"))): _*)))
      .select(candidates.columns.toIndexedSeq.map(col) :+ col("cell.d").as("d") :+
        col("cell.slot").as("slot"): _*)
    cells.join(broadcast(sketch), Seq("d", "slot"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .groupBy(candidates.columns.toIndexedSeq.map(col): _*)
      .agg(min(col("cnt")).as("est_cnt"))
  }
}
