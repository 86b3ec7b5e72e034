package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Portable

/** Corpus-shaping operators for training-data export: deterministic
  * subsampling and greedy sequence packing. Both are pure codegen'd
  * projections/windows with engine-portable arithmetic (md5-derived hashes,
  * integral division), so an independent SQL engine reproduces every row.
  */
object Sampling {

  /** Deterministic hash sampling: keep a row iff
    * `hash60(id) mod den < num` — a stable num/den fraction that is
    * reproducible across runs, engines and cluster sizes (unlike
    * `DataFrame.sample`, whose outcome depends on partitioning). Selection
    * is per-id, so re-running on a grown corpus keeps previously selected
    * ids selected. No shuffle: a single codegen'd filter. */
  def sampleByHash(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame = {
    require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den")
    df.where(Portable.hash60(col(idCol).cast("string")) % den < num)
  }

  /** Deterministic TRAIN/VAL/TEST splitting: every row gets exactly one
    * split label from its id hash — `splits` are (name, permille) weights
    * summing to 1000, and the label is the bucket `hash60(seed:id) % 1000`
    * lands in. Per-id fates ([[sampleByHash]] semantics): assignment is
    * stable across runs, engines, cluster sizes, and re-shuffles of the
    * corpus, so a document can never leak from train into an eval split
    * because a pipeline re-run dealt different cards. A fresh `seed` is a
    * fresh independent partition. One codegen'd projection — no shuffle, no
    * sampling pass, no global count. Adds a `split` column. A NULL id gets a
    * NULL split (the hash is null, so every bucket test is unknown) — never
    * a silent assignment to some bucket; filter or fix null ids upstream. */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Int)], seed: Int = 0): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"split weights must be positive: $splits")
    require(splits.map(_._2).sum == 1000,
      s"split permille weights must sum to 1000 (got ${splits.map(_._2).sum})")
    val p = Portable.hash60(seed, col(idCol).cast("string")) % 1000
    val bounds = splits.scanLeft(0)(_ + _._2).tail
    // every branch is a strict `when` (the last tests p < 1000, always true
    // for a real hash): a null id matches no branch and yields NULL
    val label = splits.zip(bounds).foldRight(lit(null).cast("string"): Column) {
      case (((name, _), hi), rest) => when(p < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", label)
  }

  /** Temperature-based source rebalancing — the multilingual α-sampling
    * rule (XLM/mT5): resample so source s's share follows
    * `q_s ∝ n_s^alpha` instead of its raw share `n_s` (α = 1 keeps the
    * natural distribution; α → 0 flattens toward uniform; the usual
    * α ∈ [0.2, 0.7] boosts low-resource sources). As a FILTER-ONLY op (no
    * upsampling), the keep rate is `r_s = n_s^(α−1) / max_t n_t^(α−1)` —
    * the smallest source is kept whole and larger sources are downsampled
    * toward the target shape.
    *
    * Determinism: per-source counts are exact integers (one aggregate over
    * the bounded source column — the same bounded-sources precondition as
    * [[mixBySource]]); keep thresholds are driver-computed doubles
    * (`StrictMath.pow`, reproducible) frozen into 60-bit INTEGER
    * thresholds, and the draw is [[sampleWeighted]]'s
    * `hash60(seed:id) < t_s` — per-id fates, engine-reproducible, one
    * broadcast join + one codegen'd filter, no corpus shuffle.
    *
    * Returns the kept rows with their source; [[temperatureThresholds]]
    * exposes the (source, threshold) table so the artifact can be
    * persisted/spliced (an oracle replays the draw bit-for-bit from it). */
  def sampleTemperature(df: DataFrame, idCol: String, srcCol: String,
                        alpha: Double, seed: Int = 0): DataFrame =
    sampleTemperatureWith(df, idCol, srcCol,
      temperatureThresholds(df, srcCol, alpha), seed)

  /** [[sampleTemperature]] against a PRECOMPUTED threshold artifact — reuse
    * a stashed/persisted table instead of re-aggregating the corpus.
    *
    * DROP semantics (deliberate, and what the oracle replays): the join is
    * INNER, so rows whose source is absent from the artifact — a NULL
    * source, or a source that appeared after the artifact was computed —
    * are dropped, not kept whole. Dropping an unknown source is the safe
    * default for a rebalancing draw (keeping it whole would let a new
    * dominant source flood the mix the artifact was tuned to prevent);
    * recompute the artifact to admit new sources. */
  def sampleTemperatureWith(df: DataFrame, idCol: String, srcCol: String,
                            thresholds: Seq[(String, Long)],
                            seed: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val thr = thresholds.toDF(srcCol, "_thr")
    df.join(broadcast(thr), Seq(srcCol))
      .where(Portable.hash60(seed, col(idCol).cast("string")) < col("_thr"))
      .drop("_thr")
  }

  /** The (source, 60-bit keep threshold) artifact of [[sampleTemperature]]:
    * threshold = floor(n_s^(α−1) / max_t n_t^(α−1) · 2^60). */
  def temperatureThresholds(df: DataFrame, srcCol: String,
                            alpha: Double): Seq[(String, Long)] = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0, 1], got $alpha")
    val counts: Seq[(String, Long)] = df.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy(_._1) // deterministic driver-side fold order
    require(counts.nonEmpty, "no sources")
    val pow = counts.map { case (s, n) => (s, StrictMath.pow(n.toDouble, alpha - 1.0)) }
    val mx = pow.map(_._2).max
    pow.map { case (s, p) =>
      val r = p / mx // in (0, 1], 1 for the smallest source
      s -> (if (r >= 1.0) (1L << 60) else (r * (1L << 60).toDouble).toLong)
    }
  }

  /** Deterministic WEIGHTED (importance) sampling: keep a row with
    * probability = its weight (clamped to [0, 1]) — the quality-weighted
    * corpus draw (keep high-quality docs with certainty, downsample the
    * tail proportionally). The draw is `hash60(seed:id) <
    * floor(clamp(w) * 2^60)`: pure integer comparison against an
    * IEEE-deterministic threshold, so the SAME rows are kept across runs,
    * engines, and cluster sizes, and a fresh `seed` is a fresh independent
    * draw. One codegen'd filter, no shuffle. */
  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
                     seed: Int = 0): DataFrame = {
    val w = least(greatest(col(weightCol).cast("double"), lit(0.0)), lit(1.0))
    df.where(Portable.hash60(seed, col(idCol).cast("string")) <
      floor(w * lit(Sketch.HashSpace.toDouble)).cast("long"))
  }

  /** Stratified deterministic sampling: per-stratum num/den keep fractions
    * (first matching stratum wins; `default` covers the rest) — the standard
    * corpus-rebalancing step (e.g. downsample the dominant language, keep
    * low-resource strata whole). Selection stays per-id ([[sampleByHash]]
    * semantics), so a document keeps one fate across runs and engines; the
    * whole operator is a single codegen'd filter, no shuffle, no join. */
  /** Deterministic MIXTURE sampling (training-data mixing): downsample each
    * source so the kept corpus's mass (tokens/chars — `massCol`) follows the
    * requested relative `weights`, at the largest total the data allows.
    * The limiting source (the one whose availability/weight ratio is
    * smallest) keeps everything; every other source keeps the fraction that
    * matches its target share — the standard doc-level Bernoulli draw whose
    * expected mass hits the mixture exactly.
    *
    * Fractions are computed IN the plan from the per-source mass aggregate
    * (a tiny groupBy over |weights| rows, broadcast back), so the operator
    * needs no pre-counting pass by the caller, and the whole computation —
    * IEEE double chain included — is reproducible by an independent SQL
    * engine. The draw itself is [[sampleWeighted]]'s integer-threshold
    * rule: `hash60(id) < floor(frac · 2⁶⁰)`, one codegen'd filter over the
    * corpus, no corpus-wide shuffle. Sources absent from `weights` are
    * dropped (weight 0). */
  def mixBySource(df: DataFrame, idCol: String, sourceCol: String,
                  massCol: String, weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    require(weights.map(_._1).distinct.size == weights.size, "duplicate source")
    val spark = df.sparkSession
    val w = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(
        weights.map { case (s, wt) => org.apache.spark.sql.Row(s, wt) }).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_src",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_wt",
          org.apache.spark.sql.types.DoubleType))))
    val dm = df.select(col(idCol), col(sourceCol), col(massCol).cast("long").as("_mass"))
      .join(broadcast(w), col(sourceCol) === col("_src"))
    val am = dm.groupBy(col(sourceCol), col("_wt"))
      .agg(sum("_mass").cast("double").as("_avail"))
    val total = am.select(min(col("_avail") / col("_wt")).as("_total"))
    val fracs = am.crossJoin(broadcast(total))
      .select(col(sourceCol).as("_fsrc"),
        (col("_wt") * col("_total") / col("_avail")).as("_frac"))
    dm.join(broadcast(fracs), col(sourceCol) === col("_fsrc"))
      .where(Portable.hash60(col(idCol).cast("string")) <
        floor(col("_frac") * lit(Sketch.HashSpace.toDouble)).cast("long"))
      .select(col(idCol), col(sourceCol))
  }

  /** Admit documents per source until a TOKEN budget is met — the "data
    * recipe" mixing step: pretraining mixes are specified in tokens, not
    * documents, so the admission unit must be the token count. Docs are
    * considered in a deterministic seeded-hash order (a reproducible
    * shuffle, so the admitted set is an unbiased sample of the source, not
    * its head) and admitted while the running token total INCLUDING the
    * doc stays within the budget; the doc that would cross it, and
    * everything after, is cut. Sources absent from `budgets` are dropped.
    *
    * Emits `(id, source, n_tokens, cum_tokens)` — all integers, so the SQL
    * oracle reproduces the cut bit-for-bit. Scale: one keyed window per
    * source (a single shuffle on the source key; no global order), budget
    * table broadcasts. Skewed source sizes are fine — the window's state is
    * one running sum. */
  def sampleToTokenBudget(df: DataFrame, idCol: String, textCol: String,
                          sourceCol: String, budgets: Seq[(String, Long)],
                          seed: Int = 7): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0), "budgets must be >= 0")
    require(budgets.map(_._1).distinct.size == budgets.size, "duplicate source")
    val spark = df.sparkSession
    import spark.implicits._
    val b = broadcast(budgets.toDF("_src", "_budget"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(sourceCol))
      .orderBy(Portable.hash60(seed, col(idCol).cast("string")).asc, col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    // budget join BEFORE the window: out-of-recipe sources drop before the
    // source-keyed shuffle instead of riding it only to be discarded, and
    // pruning whole sources cannot change surviving sources' running sums
    df.select(col(idCol), col(sourceCol),
        size(Portable.words(col(textCol))).cast("long").as("n_tokens"))
      .join(b, col(sourceCol) === col("_src"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .where(col("cum_tokens") <= col("_budget"))
      .select(col(idCol), col(sourceCol), col("n_tokens"), col("cum_tokens"))
  }

  /** STREAMING token-budget admission — the online form of
    * [[sampleToTokenBudget]]: the per-source running token total is the
    * ONLY state (`flatMapGroupsWithState`, carried across micro-batches);
    * within a batch a source's arrivals are considered in the same
    * seeded-hash order as the batch operator, so a corpus arriving as ONE
    * batch admits exactly the batch operator's set, and across batches the
    * admission is the deterministic fold of per-batch hash orders. The
    * total accumulates over EVERY doc (admitted or not) exactly like the
    * batch cum-filter, so a source that crosses its budget is closed
    * forever. Sources absent from `budgets` drop; ids must be long.
    *
    * CONTRACT: run under a rate-limited trigger. Sorting a source's slice
    * into seeded-hash order requires buffering it on one task, so the
    * per-batch group buffer is bounded by the micro-batch size — the
    * source's admission control (`maxOffsetsPerTrigger` /
    * `maxBytesPerTrigger`) is the knob. An unthrottled AvailableNow
    * catch-up over a large backlog would deliver the whole backlog as one
    * batch; rather than silently OOM the task, the fold FAILS FAST when a
    * source's slice exceeds `maxBatchRows` (raise it deliberately if a
    * bigger buffer is really wanted). */
  def tokenBudgetStream(stream: DataFrame, idCol: String, textCol: String,
                        sourceCol: String, budgets: Seq[(String, Long)],
                        seed: Int = 7,
                        maxBatchRows: Int = 4 * 1000 * 1000): DataFrame = {
    require(maxBatchRows >= 1, "maxBatchRows must be positive")
    require(budgets.nonEmpty && budgets.forall(_._2 >= 0), "budgets must be >= 0")
    require(budgets.map(_._1).distinct.size == budgets.size, "duplicate source")
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val bmap = budgets.toMap
    val rows = stream.select(
        col(idCol).cast("long"),
        col(sourceCol).cast("string"),
        size(Portable.words(col(textCol))).cast("long"),
        Portable.hash60(seed, col(idCol).cast("string")))
      .as[(Long, String, Long, Long)]
    val fold = (src: String, it: Iterator[(Long, String, Long, Long)],
                state: GroupState[Long]) =>
      bmap.get(src) match {
        case None => Iterator.empty
        case Some(budget) =>
          var cum = state.getOption.getOrElse(0L)
          val buf = scala.collection.mutable.ArrayBuffer[(Long, String, Long, Long)]()
          it.foreach { r =>
            if (buf.size >= maxBatchRows)
              throw new IllegalStateException(
                s"tokenBudgetStream: source '$src' delivered more than " +
                  s"$maxBatchRows rows in one micro-batch — the seeded-hash " +
                  "sort buffers a source's slice on one task, so run under a " +
                  "rate-limited trigger (maxOffsetsPerTrigger) or raise " +
                  "maxBatchRows deliberately")
            buf += r
          }
          val admitted = buf.sortBy(r => (r._4, r._1)).flatMap { r =>
            cum += r._3
            if (cum <= budget) Some((r._1, src, r._3, cum)) else None
          }
          state.update(cum)
          admitted.iterator
      }
    rows.groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
      .toDF(idCol, sourceCol, "n_tokens", "cum_tokens")
  }

  def sampleStratified(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Seq[(String, (Int, Int))],
                       default: (Int, Int) = (1, 1)): DataFrame = {
    (fractions.map(_._2) :+ default).foreach { case (num, den) =>
      require(num >= 0 && den > 0 && num <= den, s"bad fraction $num/$den") }
    val h = Portable.hash60(col(idCol).cast("string"))
    val keep = fractions.foldRight((h % default._2 < default._1): Column) {
      case ((stratum, (num, den)), rest) =>
        when(col(strataCol) === stratum, h % den < num).otherwise(rest)
    }
    df.where(keep)
  }

  /** Deterministic corpus shuffle for training-data export: every row gets a
    * seeded pseudo-random `shuffle_key`, a `shard` (key mod `numShards`) and
    * its rank within the shard (`shard_pos`) — reading shards in order of
    * (shard, shard_pos) IS the shuffled corpus. Seeded hashing makes epochs
    * reproducible (same seed → same order) and independent (different seed →
    * fresh permutation), regardless of cluster size or partitioning.
    *
    * Scale: the window partitions by shard — numShards sets the parallelism
    * (use thousands at 100 TB); no global sort, no single-partition window. */
  def shuffleDeterministic(df: DataFrame, idCol: String, seed: Int,
                           numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key", Portable.hash60(seed, col(idCol).cast("string")))
      .withColumn("shard", col("shuffle_key") % numShards)
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** Deterministic k-per-group sample: the k rows whose seeded hash60 is
    * smallest within each group — a uniform-without-replacement draw that is
    * reproducible across runs, engines and cluster sizes, with a fresh
    * independent draw per seed.
    *
    * Runs on the bounded-state [[org.apache.spark.sql.graftshim.TopKAgg]]
    * aggregate: O(k) state per group per partition, map-side partials — the
    * scale path for per-group sampling, where the window formulation
    * (`row_number() <= k` over the hash) shuffles and sorts EVERY row of
    * every group. Output: (groupCols..., idCol) of the selected rows; join
    * back on the id for payloads.
    *
    * PRECONDITION: `idCol` must be distinct within each group. The aggregate
    * emits distinct (hash, id) pairs, while [[sampleKPerGroupViaWindow]] can
    * emit a duplicated id twice — the unit-pinned equivalence between the
    * two holds only for duplicate-free ids (the pin compares on
    * `data.distinct()`). Dedupe first if ids can repeat. */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                      k: Int, seed: Int = 0): DataFrame = {
    import org.apache.spark.sql.graftshim.{GraftShims, TopKAgg}
    require(k >= 1, "k must be at least 1")
    val grp = groupCols.map(col)
    val pairs = GraftShims.column(TopKAgg(
      GraftShims.expr(Portable.hash60(seed, col(idCol).cast("string"))),
      GraftShims.expr(col(idCol).cast("long")), k).toAggregateExpression())
    OpUtil.rebalance(df)
      .groupBy(grp: _*).agg(pairs.as("_sel"))
      .select(grp :+ explode(col("_sel")).as("_e"): _*)
      .select(grp :+ col("_e.v").as(idCol): _*)
  }

  /** The [[sampleKPerGroup]] window twin — the declarative formulation used
    * by the oracle and the equivalence unit test. Same distinct-id
    * precondition as the aggregate (a duplicated id ranks twice here but
    * collapses to one pair there). */
  def sampleKPerGroupViaWindow(df: DataFrame, groupCols: Seq[String],
                               idCol: String, k: Int, seed: Int = 0): DataFrame = {
    val grp = groupCols.map(col)
    val w = Window.partitionBy(grp: _*)
      .orderBy(Portable.hash60(seed, col(idCol).cast("string")).asc, col(idCol).asc)
    df.select(grp :+ col(idCol).cast("long").as(idCol): _*)
      .withColumn("_rn", row_number().over(w)).where(col("_rn") <= k)
      .drop("_rn")
  }

  /** Greedy contiguous sequence packing: documents, in `idCol` order, are
    * assigned to consecutive packs of ~`tokensPerPack` whitespace tokens; a
    * document never splits, so a pack may overflow by at most one document
    * (the standard pre-tokenization packing rule).
    *
    * Scale note: a global order means a single-partition window — fine up to
    * millions of docs, not at 100 TB. Pass `shardCol` (any coarse bucket,
    * e.g. `hash60(id) % 1024`) to pack within shards: embarrassingly
    * parallel, same guarantee per shard, pack ids unique as (shard, pack).
    * `shardCol` has NO default: the global window is a silent scale-killer
    * as a default, so callers choose explicitly — `Some(bucket)` at scale,
    * `None` only when the corpus is known small and one strict global order
    * is genuinely required. */
  def packGreedy(docs: DataFrame, idCol: String, textCol: String,
                 tokensPerPack: Int, shardCol: Option[String]): DataFrame = {
    require(tokensPerPack > 0, "tokensPerPack must be positive")
    val n = size(Portable.words(col(textCol))).cast("long")
    val w = shardCol match {
      case Some(s) => Window.partitionBy(col(s)).orderBy(col(idCol))
      case None    => Window.orderBy(col(idCol))
    }
    val cum = w.rowsBetween(Window.unboundedPreceding, -1)
    val base = docs.select(
      (col(idCol) +: shardCol.map(col).toSeq) :+ n.as("n_tokens"): _*)
    base
      .withColumn("cum_before", coalesce(sum("n_tokens").over(cum), lit(0L)))
      .withColumn("pack_id", expr(s"cum_before div $tokensPerPack"))
      .drop("cum_before")
  }
}
