package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for every left row, the single most recent right row
  * at or before the left row's time, per key. The standard temporal-join of
  * event analytics (trade→quote, event→latest dimension version) that Spark
  * has no native operator for.
  *
  * Implementation is the scalable union-and-sweep formulation, not a
  * point-lookup join: tag both sides, union them, and run ONE ordered window
  * per key carrying the last non-null right-side values forward. Costs a
  * single hash shuffle on the key plus a per-key sort — exactly the
  * sort-merge-join shuffle shape, with no range lookup, no broadcast of
  * either side, and no row explosion, so it survives any scale the key
  * cardinality spreads over. A right row never travels further than its own
  * partition; skewed keys shard the same way any keyed window does.
  *
  * Tie rules (documented and oracle-checked):
  *  - right rows AT the left row's time match (`<=`, ASOF convention);
  *  - among right rows sharing the matching time, the one with the greatest
  *    `rightIdCol` wins (deterministic across engines and partitionings);
  *  - with `toleranceMs`, matches older than `leftTime - tolerance` are
  *    nulled out (the pandas `merge_asof(tolerance=)` contract).
  */
/** One row of the union feeding [[AsOfJoin.streamingEnrich]]: `is_right`
  * marks dimension-version rows; `offset` is the stream's arrival order
  * (eslog `base_offset`); `t` is carried event time. */
final case class EnrichEvent(user_id: Long, offset: Long, is_right: Boolean, t: Long)

/** [[AsOfJoin.streamingEnrich]] output: each probe row with the latest
  * dimension version that had ARRIVED before it (None = no version yet). */
final case class Enriched(user_id: Long, offset: Long, t: Long,
                          matched_offset: Option[Long], matched_t: Option[Long])

private[operators] final case class DimVersionState(offset: Long, t: Long)

object AsOfJoin {

  /** @param left       probe side; one output row per input row
    * @param right      build side whose latest-at-or-before row is attached
    * @param keyCol     equality key present on both sides
    * @param timeCol    ordering column present on both sides (any integral
    *                   unit; tolerance is in the same unit)
    * @param rightIdCol right-side unique id — deterministic tie-break and the
    *                   emitted match identifier
    * @param rightValueCols right-side columns to attach (emitted as
    *                   `matched_<name>`, NULL when no match)
    * @param tolerance  max allowed `leftTime - rightTime` (same unit as
    *                   `timeCol`); None = unbounded look-back
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
           rightIdCol: String, rightValueCols: Seq[String],
           tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(c => c.startsWith("matched_") || c == "_side"),
      "left side may not contain reserved columns (_side, matched_*)")
    val attached = ("_t" + rightIdCol) +: rightValueCols.map("_v" + _)

    // Right rows carry their payload in shadow columns; left rows carry NULLs
    // there. After the union both sides share one schema: (key, time, side,
    // shadows..., left payload...).
    val rTagged = right.select(
      (col(keyCol) +: col(timeCol).as("_time") +: lit(0).as("_side") +:
        col(rightIdCol).cast("long").as("_t" + rightIdCol) +:
        rightValueCols.map(c => col(c).as("_v" + c))) ++
        leftCols.filter(c => c != keyCol).map(c =>
          lit(null).cast(left.schema(c).dataType).as("_l" + c)): _*)
    val lTagged = left.select(
      (col(keyCol) +: col(timeCol).as("_time") +: lit(1).as("_side") +:
        lit(null).cast("long").as("_t" + rightIdCol) +:
        rightValueCols.map(c => lit(null).cast(right.schema(c).dataType).as("_v" + c))) ++
        leftCols.filter(c => c != keyCol).map(c => col(c).as("_l" + c)): _*)

    // Sweep order (time, side=right-first, right id): at any left row the
    // last non-null shadow value is the latest right row <= its time, ties
    // resolved to the max right id. ONE window services every carried column.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_time").asc, col("_side").asc, col("_t" + rightIdCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rTagged.unionByName(lTagged)
      .withColumn("_mtime", last(when(col("_side") === 0, col("_time")), ignoreNulls = true).over(w))
      .withColumns(attached.map(c => c -> last(col(c), ignoreNulls = true).over(w)).toMap)

    val inTol = tolerance match {
      case Some(t) => col("_mtime").isNotNull && (col("_time") - col("_mtime") <= t)
      case None => col("_mtime").isNotNull
    }
    carried.where(col("_side") === 1).select(
      (col(keyCol) +:
        leftCols.filter(_ != keyCol).map(c => col("_l" + c).as(c))) ++
        (when(inTol, col("_t" + rightIdCol)).as("matched_" + rightIdCol) +:
          when(inTol, col("_mtime")).as("matched_" + timeCol) +:
          rightValueCols.map(c => when(inTol, col("_v" + c)).as("matched_" + c))): _*)
  }

  /** STREAMING as-of enrichment — the online sibling of [[asOf]]: every probe
    * row is joined to the latest dimension version that had ARRIVED before it
    * (arrival = stream offset order), the KTable-style enrich-against-current
    * -state semantic. State per key is ONE version (O(1) — no buffering of
    * probe rows, no retained history), so key cardinality is the only state
    * driver at any scale.
    *
    * Determinism: an eslog source delivers offsets in order, batches are
    * sorted per key before folding, and the match rule is strictly
    * `version.offset < probe.offset` — so the result is IDENTICAL under any
    * micro-batch chunking, and equals the batch [[asOf]] run on the offset
    * axis (both facts unit-pinned; the oracle recomputes the rule as a
    * lateral lookup). */
  def streamingEnrich(events: Dataset[EnrichEvent]): Dataset[Enriched] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    def fold(user: Long, it: Iterator[EnrichEvent],
             state: GroupState[DimVersionState]): Iterator[Enriched] = {
      val sorted = it.toSeq.sortBy(_.offset)
      var cur = state.getOption
      val out = Seq.newBuilder[Enriched]
      sorted.foreach { e =>
        if (e.is_right) {
          if (cur.forall(_.offset < e.offset)) cur = Some(DimVersionState(e.offset, e.t))
        } else {
          out += Enriched(user, e.offset, e.t, cur.map(_.offset), cur.map(_.t))
        }
      }
      cur.foreach(state.update)
      out.result().iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
  }
}
