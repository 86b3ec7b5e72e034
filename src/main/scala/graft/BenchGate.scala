package graft

/** Host-noise gating for the registry segment of the benchmark.
  *
  * The append window has had a quiet-window gate since round 9 (rel-IQR over
  * 16 identical commits), but a multi-minute host slow-phase that spans a
  * whole stretch of registry queries is invisible to per-query spread: three
  * back-to-back runs INSIDE one slow phase time consistently, so
  * `(max-min)/min` reads "quiet" while every figure is inflated 2-5x (this is
  * exactly what the round-9 driver window recorded for the sketch family).
  *
  * The fix is an out-of-band meter: a fixed CPU-bound sentinel computation is
  * timed between segments of ~10 registry heads. Identical work should time
  * identically; a sentinel that drifts above `factor` x its baseline marks
  * every query timed between the two disturbed boundaries as host-suspect,
  * and those segments are re-measured. The decision logic lives here, pure,
  * so a unit can replay a synthetic slow phase and assert the gate flags it.
  */
object BenchGate {
  /** Indices of segments whose timing window was host-disturbed.
    *
    * @param boundaries sentinel seconds measured at segment boundaries —
    *                   `boundaries(i)` and `boundaries(i+1)` bracket segment
    *                   `i`, so the list has (number of segments + 1) entries
    * @param s0         the sentinel's baseline (median of several runs in a
    *                   known-quiet moment, before the registry starts)
    * @param factor     drift threshold: a boundary above `factor * s0` is
    *                   disturbed, and a segment is dirty if EITHER of its
    *                   bounding sentinels is disturbed (a phase shorter than
    *                   one segment can still slip through; the observed
    *                   failure mode is multi-minute phases spanning several)
    */
  def dirtySegments(boundaries: Seq[Double], s0: Double,
                    factor: Double = 1.5): Set[Int] = {
    require(boundaries.size >= 2, "need at least one segment (two boundaries)")
    require(s0 > 0 && factor >= 1.0)
    def disturbed(s: Double): Boolean = s > s0 * factor
    (0 until boundaries.size - 1)
      .filter(i => disturbed(boundaries(i)) || disturbed(boundaries(i + 1)))
      .toSet
  }

  /** [[dirtySegments]] for a sentinel measured at only SOME boundaries —
    * the IO sentinel, which brackets only segments whose heads are IO-heavy
    * (`None` = not measured there, contributes nothing).
    *
    * Why a second sentinel exists at all (the round-10 instrument gap): the
    * CPU sentinel is pure compute, so a sustained host IO-THROTTLE phase is
    * invisible to it — the r10 driver window timed an IO-heavy head at
    * 33 MB/s (58.7 s vs 0.5-0.7 s re-measured) inside a segment whose CPU
    * sentinels read clean. An IO-bound probe (re-reading a pinned slice of
    * the same stream through the same fetch path) feels exactly that phase.
    * A segment is dirty if EITHER of its measured bounding probes drifted;
    * callers union this with the CPU verdict. */
  def dirtySegmentsSparse(boundaries: Seq[Option[Double]], s0: Double,
                          factor: Double = 2.0): Set[Int] = {
    require(boundaries.size >= 2, "need at least one segment (two boundaries)")
    require(s0 > 0 && factor >= 1.0)
    def disturbed(s: Option[Double]): Boolean = s.exists(_ > s0 * factor)
    (0 until boundaries.size - 1)
      .filter(i => disturbed(boundaries(i)) || disturbed(boundaries(i + 1)))
      .toSet
  }

  /** Partition `names` into segments of at most `segmentSize`, preserving
    * order: the unit the sentinel brackets. */
  def segments[A](names: Seq[A], segmentSize: Int): Seq[Seq[A]] = {
    require(segmentSize >= 1)
    names.grouped(segmentSize).toSeq
  }

  /** CROSS-RUN host-health check (the round-14 instrument gap): every
    * within-run gate above compares sentinels against a baseline measured on
    * the SAME host window, so a host that is uniformly degraded for the whole
    * run passes every gate — the r14 driver host ran the IO sentinel at
    * 1.596 s vs the prior gated run's 0.090 s (17.7x) and certified a window
    * in which every IO-latency head was 2.3-3.6x inflated. The fix is to
    * persist each run's final sentinel baselines (`registry_sentinel_s0`,
    * `io_sentinel_s0`, `mem_sentinel_s0`) in BENCH_PRIOR.json next to the
    * per-head envelope, and compare the CURRENT run's baselines against the
    * last gated run's at run end.
    *
    * Returns the names of sentinels that drifted above `factor` x their
    * prior value. A non-empty result marks the whole run HOST-SUSPECT:
    * its figures publish (with the flag) but it must NOT overwrite the
    * prior file — a degraded run that overwrote the envelope would make the
    * NEXT degraded run read "clean" against it (baseline poisoning).
    * Sentinels absent from `prior` (first gated run, or a newly added probe)
    * contribute nothing; a FASTER current sentinel is never drift (host got
    * quieter — the new prior records it when the run publishes). */
  def sentinelDrift(prior: Map[String, Double], current: Map[String, Double],
                    factor: Double = 2.0): Seq[String] = {
    require(factor >= 1.0)
    current.keys.toSeq.sorted.filter { k =>
      prior.get(k).exists(p => p > 0 && current(k) > p * factor)
    }
  }

  /** ROLLING prior envelope (the round-15 instrument gap — the ratchet):
    * comparing each run only against the IMMEDIATELY previous gated run, at
    * a flag factor F, lets a head degrade <F per run indefinitely with no
    * flag — r15 recorded exactly this: `sketch_kmv_overlap` slid
    * 0.825 → 0.937 → 1.126 → 3.099 s across four consecutive gated runs,
    * each step under the 3x factor, each run overwriting the prior, so a
    * 3.8x cumulative regression was silently enshrined as the baseline.
    *
    * The envelope is therefore the per-head MIN across the last N gated
    * runs' (already ratchet-guarded, see [[priorStoreValue]]) best-of-3
    * figures. Entries with non-positive values (failed heads) contribute
    * nothing; a head absent from every entry has no envelope (new head —
    * its first gated figure seeds it). */
  def rollingEnvelope(history: Seq[Map[String, Double]]): Map[String, Double] =
    history.flatten.filter(_._2 > 0).groupMapReduce(_._1)(_._2)(math.min)

  /** Heads whose current best-of-3 landed above `factor` x the rolling
    * envelope, with their ratios — the in-band "this head is weak" flag the
    * r15 verdict had to reconstruct from git archaeology. Sorted by name so
    * the JSON field is diff-stable. */
  def regressedHeads(best: scala.collection.Map[String, Double],
                     envelope: Map[String, Double],
                     factor: Double): Seq[(String, Double)] = {
    require(factor >= 1.0)
    best.toSeq.sortBy(_._1).flatMap { case (n, b) =>
      envelope.get(n).filter(p => p > 0 && b > p * factor).map(p => n -> b / p)
    }
  }

  /** ROLLING envelope for HIGHER-is-better THROUGHPUT headlines (the
    * round-16 instrument gap): `append_mbps`/`scan_mbps`/`export_mbps`/
    * `backfill_mbps` were stored in history but never compared — r16's
    * append slid 632 → 552 → 525 → 271 → 143 MB/s across five gated runs
    * with zero flags, because the rolling envelope covered only the
    * per-head SECONDS (and the append headline is not a timedMedian
    * head). The envelope is the per-head MAX across the last N gated
    * runs — the best throughput the engine has demonstrated. */
  def rollingEnvelopeMax(history: Seq[Map[String, Double]]): Map[String, Double] =
    history.flatten.filter(_._2 > 0).groupMapReduce(_._1)(_._2)(math.max)

  /** Throughput heads whose current figure fell BELOW envelope/factor,
    * with their ratios (envelope / current — how many times slower than
    * the demonstrated best). The mirror of [[regressedHeads]] for
    * higher-is-better figures; sorted by name for diff-stable JSON. */
  def regressedThroughput(current: scala.collection.Map[String, Double],
                          envelope: Map[String, Double],
                          factor: Double): Seq[(String, Double)] = {
    require(factor >= 1.0)
    current.toSeq.sortBy(_._1).flatMap { case (n, v) =>
      envelope.get(n).filter(p => p > 0 && v > 0 && v * factor < p)
        .map(p => n -> p / v)
    }
  }

  /** [[priorStoreValue]]'s mirror for throughput headlines: a regressed
    * head's stored envelope contribution may not FALL below
    * envelope/factor (which would let the envelope ratchet downward and
    * certify the next degraded run) unless the regression reproduced in a
    * clean re-measure. */
  def priorStoreValueThroughput(measured: Double, envelope: Option[Double],
                                factor: Double,
                                remeasuredClean: Boolean): Double =
    envelope match {
      case Some(p) if p > 0 && measured > 0 && measured * factor < p &&
          !remeasuredClean => p / factor
      case _ => measured
    }

  /** The value a new gated history entry stores for one head — the ratchet
    * guard's second half: a head's stored envelope contribution may not rise
    * past `factor` x the rolling min UNLESS the regression reproduced in a
    * fresh, clean sentinel-bracketed end-of-suite re-measure
    * (`remeasuredClean`). Without that guard the rolling window only slows
    * the ratchet (after N runs the old min rotates out); with it, every
    * envelope raise beyond the factor requires an in-band reproduction and
    * is loudly tagged in the run's JSON. A capped entry keeps the OLD
    * envelope alive (at factor x) while the flag persists run over run
    * until the head is fixed or the regression is reproduced-and-accepted. */
  def priorStoreValue(measured: Double, envelope: Option[Double],
                      factor: Double, remeasuredClean: Boolean): Double =
    envelope match {
      case Some(p) if p > 0 && measured > p * factor && !remeasuredClean =>
        p * factor
      case _ => measured
    }
}
