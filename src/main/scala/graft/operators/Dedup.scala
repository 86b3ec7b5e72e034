package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Deduplication operators for large-scale document pipelines.
  *
  * All four families are declarative DataFrame plans so Catalyst handles
  * pushdown/pruning and every shuffle is an explicit hash aggregation or
  * equi-join on a bounded key — nothing here is an all-pairs comparison:
  *
  *  - exact: one hash-aggregate on sha256(text). O(N) map + 1 shuffle.
  *  - ngramJaccard: inverted-index self-join on shingles. The join key is the
  *    shingle, so co-occurring docs meet on the shuffle; pairs are counted,
  *    never materialized per-token on the driver.
  *  - minHashLsh: MinHash signatures (k portable hash functions) banded into
  *    b groups; candidates = docs sharing a (band, signature) bucket. At
  *    100 TB the bucket join replaces the quadratic all-pairs scan; the
  *    verify step only touches candidate pairs.
  *  - simHash: 60-bit sign-sum fingerprint per doc; near-dup = small Hamming
  *    distance (joinable by fingerprint bands if needed).
  *
  * Hashes are md5-based [[Portable]] primitives so an independent SQL engine
  * reproduces every value exactly (the driver's DuckDB oracle does).
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min id) per distinct
    * text + duplicate count. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(sha2(col(textCol).cast("binary"), 256).as("h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dups"))
      .select(idCol, "h", "dups")

  /** N-gram (word shingle) Jaccard similarity join: all pairs (i < j) with
    * |shingles_i ∩ shingles_j| / |union| >= threshold.
    *
    * Inverted-index plan: explode distinct shingles, self-join on the shingle
    * (equi-join => hash shuffle on shingle, no cartesian), count matches per
    * pair, combine with per-doc set sizes. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"), explode(Portable.wordShingles(col(textCol), k)).as("s"))
      .distinct()
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("i"), col("b.doc").as("j"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.withColumnRenamed("doc", "i").withColumnRenamed("n", "ni"), "i")
      .join(sizes.withColumnRenamed("doc", "j").withColumnRenamed("n", "nj"), "j")
      .withColumn("jaccard", col("inter") / (col("ni") + col("nj") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }

  /** MinHash signature columns m0..m{numHashes-1}: per doc, min over shingles
    * of the seeded portable hash. */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int, numHashes: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"), explode(Portable.wordShingles(col(textCol), k)).as("s"))
    val mins = (0 until numHashes).map(i => min(Portable.hash60(i, col("s"))).as(s"m$i"))
    sh.groupBy("doc").agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH candidate pairs: signatures banded into `bands` groups of
    * `numHashes/bands` rows; docs sharing any (band, signature) bucket are
    * candidates. Probability a pair with Jaccard j collides:
    * 1 - (1 - j^r)^b — the standard S-curve; 16 hashes / 4 bands puts the
    * knee near j ≈ 0.5. */
  def minHashLshCandidates(docs: DataFrame, idCol: String, textCol: String,
                           k: Int = 3, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sigs = minHashSignatures(docs, idCol, textCol, k, numHashes)
    val bandSigs = (0 until bands).map { b =>
      concat_ws(",", (0 until r).map(i => col(s"m${b * r + i}")): _*).as(s"band$b")
    }
    val banded = sigs.select(col("doc") +: bandSigs: _*)
    val exploded = banded.select(col("doc"),
      posexplode(array((0 until bands).map(b => col(s"band$b")): _*)).as(Seq("band", "sig")))
    exploded.as("a").join(exploded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("i"), col("b.doc").as("j"))
      .distinct()
  }

  /** SimHash fingerprint (60-bit): per token occurrence, each hash bit votes
    * +1/-1; fingerprint bit b is set iff the bit-b vote sum is positive. */
  def simHash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 60): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(Portable.words(col(textCol))).as("t"))
      .withColumn("h", Portable.hash60(col("t")))
    val votes = (0 until bits).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"v$b")
    }
    val agg = toks.groupBy("doc").agg(votes.head, votes.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc"), fp.as("simhash"))
  }

  /** Exact-verified near-dup pipeline: LSH candidates, then exact Jaccard on
    * candidates only (the 100 TB path: verification cost is proportional to
    * candidates, not pairs). */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      k: Int = 3, numHashes: Int = 16, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    val cands = minHashLshCandidates(docs, idCol, textCol, k, numHashes, bands)
    val sh = docs.select(col(idCol).as("doc"), explode(Portable.wordShingles(col(textCol), k)).as("s"))
      .distinct()
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n"))
    // intersection via composite equi-join (doc, shingle) — linear in the
    // candidates' shingle lists, never |si| x |sj| per pair
    val inter = cands
      .join(sh.as("x"), col("i") === col("x.doc"))
      .join(sh.as("y"), col("j") === col("y.doc") && col("x.s") === col("y.s"))
      .groupBy("i", "j").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "i").withColumnRenamed("n", "ni"), "i")
      .join(sizes.withColumnRenamed("doc", "j").withColumnRenamed("n", "nj"), "j")
      .withColumn("jaccard", col("inter") / (col("ni") + col("nj") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("i"), col("j"), col("jaccard"))
  }
}
