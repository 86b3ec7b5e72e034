package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry noise gate's decision logic, replaying the round-9 failure
  * shape: a multi-minute host slow-phase covered the sketch-family stretch of
  * the registry — every query in it timed 2.3-4.9x inflated with TIGHT
  * per-run spreads (three back-to-back runs inside one phase are consistent),
  * so the in-band spread fields could not flag it. The sentinel boundaries
  * CAN: identical CPU-bound work timed between segments drifts with the host.
  */
class BenchGateSpec extends AnyFunSuite {

  test("replayed r9-shaped slow phase: exactly the covered segments flagged") {
    // 5 segments => 6 boundaries. Quiet sentinel ~0.20 s; a slow phase spans
    // segments 2 and 3 (the "sketch family"), inflating the sentinels it
    // brackets ~4x — the same factor the r9 driver window recorded.
    val boundaries = Seq(0.21, 0.20, 0.82, 0.85, 0.79, 0.22)
    val dirty = BenchGate.dirtySegments(boundaries, s0 = 0.20, factor = 1.5)
    // segment i is bracketed by boundaries (i, i+1): the inflated boundaries
    // 2,3,4 mark segments 1,2,3,4 (1 and 4 each touch one disturbed edge —
    // conservative: a phase starting/ending mid-segment still gets caught)
    assert(dirty === Set(1, 2, 3, 4))
  }

  test("quiet window: no segment flagged") {
    val boundaries = Seq(0.21, 0.20, 0.22, 0.19, 0.21, 0.20)
    assert(BenchGate.dirtySegments(boundaries, s0 = 0.19, factor = 1.5).isEmpty)
  }

  test("drift exactly at the factor is clean; just above is dirty") {
    assert(BenchGate.dirtySegments(Seq(0.30, 0.20), s0 = 0.20, factor = 1.5).isEmpty)
    assert(BenchGate.dirtySegments(Seq(0.31, 0.20), s0 = 0.20, factor = 1.5) === Set(0))
  }

  test("inflated baseline does not blind the gate when s0 uses the quietest boundary") {
    // baseline measured inside a slow phase (0.80) but the registry later ran
    // quiet (0.20): Bench takes s0 = min(raw, boundaries.min), so the dirty
    // computation sees the phase-era boundary as disturbed, not the quiet ones
    val boundaries = Seq(0.80, 0.20, 0.21, 0.20)
    val s0eff = math.min(0.80, boundaries.min)
    assert(BenchGate.dirtySegments(boundaries, s0eff, factor = 1.5) === Set(0))
  }

  test("segments preserves order and covers every head") {
    val heads = (1 to 47).map(i => s"q$i")
    val segs = BenchGate.segments(heads, 10)
    assert(segs.map(_.size) === Seq(10, 10, 10, 10, 7))
    assert(segs.flatten === heads)
  }
}
