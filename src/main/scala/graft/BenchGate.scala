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
}
