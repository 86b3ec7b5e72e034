package graft.eslog

/** PURE model of the fan-IN (N→1) — and, at N=1, the 1→1 — exactly-once
  * commit protocol: [[EsLog.consumeProcessProduceMulti]] /
  * [[EsLog.consumeProcessProduce]]'s guarded single-CAS commit, with every
  * store round-trip an explicit atomic transition so
  * FanInProtocolSpec can enumerate EVERY interleaving of rival writers,
  * producers, and crashes — the [[FanOutProtocol]] treatment applied to
  * the OTHER ETL commit shape (one destination log owns all N positions,
  * so there is exactly one commit; no intent machinery exists to model).
  *
  * Fidelity contract (each transition cites the production code it
  * mirrors; a change THERE must change HERE — all in EsLog.scala,
  * `consumeProcessProduceMulti`):
  *
  *  - `ReadSrc(i)` = the i-th `MetaLog.load(srcDirs(i))`: production loads
  *    the N sources as N separate snapshots BEFORE the destination load,
  *    so a producer append may land between them — the model interleaves
  *    there too.
  *  - `ReadDst` = the ONE `MetaLog.load(dstDir).kv` snapshot all N
  *    position reads come from (production's "a per-key load could see a
  *    torn view" comment — the model would catch exactly that bug if the
  *    single load were split). Computes `froms`/`spans`; all caught up =
  *    the early return.
  *  - `CommitData` = `EsLog.append` with `extraGuards` = one position
  *    compare PER SOURCE (advanced or not) and `extraActions` = puts for
  *    the ADVANCED positions only, all in ONE CAS with the data files: a
  *    lost compare THROWS (ConcurrentCommitException — checked against
  *    append's own commit snapshot BEFORE the zero-row early return, so
  *    the empty route aborts here too) and the job run dies. On the data
  *    route the same commit carries data + all positions atomically; on
  *    the empty route append commits nothing and the step advances to
  *    [[CommitEmpty]].
  *  - `CommitEmpty` = the positions-alone `commitWithRetry` after an
  *    all-filtered `process` output: a compare lost BETWEEN the two
  *    snapshots silently no-ops and the run CONTINUES (safe: positions
  *    never rewind, and no data was produced for the span — the
  *    enumeration proves it over every schedule); its epoch fence throws.
  *
  * Epoch fencing is NOT enumerated beyond the zombie config (rivals run at
  * the SAME epoch — the hardest case; fencing only removes writers), and
  * data content is not modeled: `process` is contractually deterministic
  * over the fixed slices, so committing each source OFFSET exactly once is
  * delivering the data exactly once.
  */
object FanInProtocol {

  type Span = (Long, Long) // [from, upTo)

  /** The destination log: the N source positions in its KV, plus the ghost
    * consumption history — one entry per committed run, carrying the spans
    * it consumed per source (empty-span sources omitted via (f, f)). */
  final case class Dst(pos: Vector[Option[Long]],
                       consumed: Vector[Vector[Span]])

  /** `heads(i)` = source i's nextOffset (producers only grow it). */
  final case class Global(heads: Vector[Long], dst: Dst)

  def initial(nSrcs: Int): Global =
    Global(Vector.fill(nSrcs)(0L),
      Dst(Vector.fill(nSrcs)(None), Vector.empty))

  /** A writer's program counter between atomic store round-trips. */
  sealed trait Pc
  /** About to `MetaLog.load` source `i` (heads read so far in `upTos`). */
  final case class ReadSrc(i: Int, upTos: Vector[Long]) extends Pc
  /** About to take the ONE destination KV snapshot. */
  final case class ReadDst(upTos: Vector[Long]) extends Pc
  /** A position exceeded its STALE head read (a rival with a fresher head
    * advanced it between our loads): about to re-load the stale sources —
    * production's one-shot refresh before `checkGroupPosition` may
    * conclude corruption. */
  final case class Refresh(prevs: Vector[Option[Long]],
                           upTos: Vector[Long]) extends Pc
  /** About to run the guarded single-CAS append (data + N positions). */
  final case class CommitData(prevs: Vector[Option[Long]],
                              spans: Vector[Span]) extends Pc
  /** Empty-route second half: append committed nothing; about to run the
    * positions-alone `commitWithRetry`. */
  final case class CommitEmpty(prevs: Vector[Option[Long]],
                               spans: Vector[Span]) extends Pc
  case object RunDone extends Pc
  /** Job run died on a lost guard (ConcurrentCommitException) or fence. */
  case object RunAborted extends Pc

  /** New positions (advanced sources only; a caught-up source keeps its
    * prev). The ghost history records the FULL span vector — (f, f) spans
    * keep per-source indices aligned for the spec's invariants. */
  private def advanced(prevs: Vector[Option[Long]],
                       spans: Vector[Span]): Vector[Option[Long]] =
    prevs.zip(spans).map { case (p, (f, u)) => if (u > f) Some(u) else p }

  /** One writer's atomic step. `nonEmptyOut(spans)` = "process() over these
    * slices returns at least one row" (production's empty route is the
    * `b == a` branch). `wEpoch < logEpoch` = this writer is a fenced
    * zombie at the destination (both its append and the empty-route
    * closure throw FencedException before anything lands). */
  def step(g: Global, pc: Pc, nonEmptyOut: Vector[Span] => Boolean,
           wEpoch: Long = Long.MaxValue, logEpoch: Long = 0L): (Global, Pc) = pc match {
    case ReadSrc(i, upTos) =>
      if (i < g.heads.size) (g, ReadSrc(i + 1, upTos :+ g.heads(i)))
      else (g, ReadDst(upTos))
    case ReadDst(upTos) =>
      val prevs = g.dst.pos
      val froms = prevs.map(_.getOrElse(0L))
      if (froms.zip(upTos).exists { case (f, u) => f > u })
        (g, Refresh(prevs, upTos)) // rival advanced past a stale head read
      else {
        val spans = froms.zip(upTos)
        if (spans.forall { case (f, u) => u <= f }) (g, RunDone) // caught up
        else (g, CommitData(prevs, spans))
      }
    case Refresh(prevs, upTos) =>
      // atomic re-load of the stale sources' heads; positions were
      // committed against a head that only grows, so the fresh head always
      // covers them — checkGroupPosition can no longer misfire (the model
      // asserts the production require here)
      val froms = prevs.map(_.getOrElse(0L))
      val upTos2 = froms.lazyZip(upTos).lazyZip(g.heads).map {
        case (f, u, h) => if (f > u) h else u }
      froms.zip(upTos2).foreach { case (f, u) =>
        require(f <= u, s"position $f beyond FRESH head $u — model violated") }
      val spans = froms.zip(upTos2)
      if (spans.forall { case (f, u) => u <= f }) (g, RunDone)
      else (g, CommitData(prevs, spans))
    case CommitData(prevs, spans) =>
      if (wEpoch < logEpoch) (g, RunAborted) // FencedException in append
      else if (g.dst.pos != prevs) (g, RunAborted) // lost guard: job dies
      else if (nonEmptyOut(spans)) {
        (g.copy(dst = Dst(advanced(prevs, spans), g.dst.consumed :+ spans)),
          RunDone)
      } else (g, CommitEmpty(prevs, spans)) // zero rows: nothing committed
    case CommitEmpty(prevs, spans) =>
      if (wEpoch < logEpoch) (g, RunAborted) // the closure fences too
      else if (g.dst.pos == prevs) {
        (g.copy(dst = Dst(advanced(prevs, spans), g.dst.consumed :+ spans)),
          RunDone)
      } else (g, RunDone) // rival moved a position: silent no-op, continue
    case RunDone | RunAborted => (g, pc) // terminal for this run
  }

  /** Run one writer to completion with NO interference — the recovery job
    * every crash/abort schedule ends with. Loops runs until every source
    * is caught up. Deterministic; bounded. */
  def recover(g0: Global, nonEmptyOut: Vector[Span] => Boolean,
              maxSteps: Int = 200): Global = {
    var g = g0
    var steps = 0
    def caughtUp(x: Global): Boolean =
      x.dst.pos.zip(x.heads).forall { case (p, h) => p.getOrElse(0L) >= h }
    while (!caughtUp(g) && steps < maxSteps) {
      var pc: Pc = ReadSrc(0, Vector.empty)
      while (pc != RunDone && pc != RunAborted && steps < maxSteps) {
        val (g2, pc2) = step(g, pc, nonEmptyOut); g = g2; pc = pc2; steps += 1
      }
      require(pc != RunAborted, "recovery with no rivals cannot lose a guard")
    }
    require(steps < maxSteps, s"recovery did not converge in $maxSteps steps")
    g
  }
}
