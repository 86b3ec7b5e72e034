package graft.eslog

/** PURE model of the fan-out exactly-once commit protocol — the
  * intent/apply/complete machine of [[EsLog.fanOutRun]] (EsLog.scala), with
  * every store round-trip an explicit atomic transition, so a spec can
  * exhaustively enumerate EVERY interleaving of rival writers, producers,
  * and crashes (the scope of the reference's TLA+ spec,
  * `docs/tlaplus/ElasticStream.tla:4-6`, done as exhaustive Scala instead).
  *
  * Fidelity contract (each transition cites the production lines it
  * mirrors; a change THERE must change HERE):
  *
  *  - `IntentRead` = the phase-1 loop's `MetaLog.load(srcDir)` snapshot
  *    (EsLog.scala "phase 1": adopt an existing intent, or compute
  *    `(prev0, from, upTo)` for a cut, or return caught-up).
  *  - `IntentCas` = the `commitWithRetry` whose closure re-checks
  *    `intent absent && pos == prev0` against the COMMIT snapshot — losing
  *    the race is a silent no-op and the outer loop re-reads. The stale
  *    `prev0` from the read step is deliberately carried: that is exactly
  *    what production compares.
  *  - `ApplyRead(i)` = phase 2's `MetaLog.load(d)` + the at-or-beyond
  *    marker skip (`prevApplied.exists(parseSpan(_)._1 >= from)`).
  *  - `ApplyCas(i)` = `EsLog.append` with
  *    `extraGuards = marker == prevApplied`: a lost guard THROWS
  *    (ConcurrentCommitException, checked against append's own snapshot
  *    BEFORE the zero-row early return — so the EMPTY route aborts here
  *    too) and kills the job run (the production recovery is "run the
  *    job again"). On the data route the same commit carries data +
  *    marker atomically; on the empty route append commits nothing and
  *    the step advances to [[ApplyCasEmpty]].
  *  - `ApplyCasEmpty(i)` = the marker-alone `commitWithRetry` after the
  *    empty append: a compare lost BETWEEN the two snapshots silently
  *    no-ops and the job CONTINUES (the documented asymmetry: by then a
  *    rival has applied at-or-beyond, so continuing is safe; this model
  *    is what proves that claim over every schedule). Its epoch fence
  *    throws (abort), like production's closure.
  *  - `Complete` = phase 3's `commitWithRetry`: position advance + intent
  *    delete in ONE CAS, no-op if the intent is no longer ours.
  *
  * Epoch fencing is NOT modeled: the enumerated rivals run at the SAME
  * epoch (the hardest case — fencing only removes writers), and the fence
  * paths are pinned by the seeded-crash + two-rival suites in EsLogSpec.
  * Data content is not modeled either: `process` is contractually a
  * deterministic function of the fixed span, so delivering the SPAN
  * exactly once is delivering the data exactly once.
  */
object FanOutProtocol {

  type Span = (Long, Long) // [from, upTo)

  /** One destination log: the applied marker (its KV) and the spans whose
    * data has been committed (ghost: the observable append history). */
  final case class Dest(applied: Option[Span], delivered: Vector[Span])

  /** The source log: group position, in-flight intent, head offset, and the
    * ghost list of completed spans (in completion order). */
  final case class Source(pos: Option[Long], intent: Option[Span],
                          nextOffset: Long, completed: Vector[Span])

  final case class Global(src: Source, dsts: Vector[Dest])

  def initial(nDsts: Int): Global =
    Global(Source(None, None, 0L, Vector.empty),
      Vector.fill(nDsts)(Dest(None, Vector.empty)))

  /** A writer's program counter between atomic store round-trips. */
  sealed trait Pc
  /** Phase-1 loop head: about to `MetaLog.load` the source. */
  case object IntentRead extends Pc
  /** About to CAS-cut intent `(from, upTo)` carrying the stale `prev0`. */
  final case class IntentCas(prev0: Option[Long], from: Long, upTo: Long) extends Pc
  /** Phase 2, destination `i`: about to load its marker. */
  final case class ApplyRead(span: Span, i: Int) extends Pc
  /** About to commit to destination `i` guarded on `prevApplied`. */
  final case class ApplyCas(span: Span, i: Int, prevApplied: Option[Span]) extends Pc
  /** Empty-route second half: production's `append()` ran first (its
    * extraGuards check passed against append's own snapshot — that is the
    * [[ApplyCas]] step) and committed nothing (zero rows); this is the
    * marker-alone `commitWithRetry` that follows, whose compare failure is
    * a SILENT no-op rather than an abort. */
  final case class ApplyCasEmpty(span: Span, i: Int, prevApplied: Option[Span]) extends Pc
  /** Phase 3: about to complete `span` on the source. */
  final case class Complete(span: Span) extends Pc
  /** Job run finished (returned, or the caught-up early return). */
  case object RunDone extends Pc
  /** Job run died on a lost append guard (ConcurrentCommitException). */
  case object RunAborted extends Pc

  /** One writer's atomic step. `route(span, i)` = "process() returns a
    * non-empty slice for destination i" (production's empty-route marker
    * advance is the `else` branch). Returns the new (global, pc).
    *
    * Epoch fencing mirrors production exactly: destination applies fence
    * (`EsLog.append` throws FencedException before anything lands; the
    * empty-route `commitWithRetry` closure throws it too), while phase 1
    * (intent cut/adopt) and phase 3 (complete) DELIBERATELY do not — a
    * fenced zombie may still adopt and complete an intent whose every
    * destination already carries an at-or-beyond marker, which is
    * convergence to the fixed outcome, not corruption (the zombie config
    * of the enumeration proves it). `wEpoch < logEpoch` = this writer is
    * a zombie at every log (the enumerated scope keeps one uniform log
    * epoch; production's per-log epochs only fence MORE). */
  def step(g: Global, pc: Pc, route: (Span, Int) => Boolean,
           wEpoch: Long = Long.MaxValue, logEpoch: Long = 0L): (Global, Pc) = pc match {
    case IntentRead =>
      g.src.intent match {
        case Some(span) => (g, ApplyRead(span, 0)) // adopt (recovery/rival)
        case None =>
          val from = g.src.pos.getOrElse(0L)
          val upTo = g.src.nextOffset
          if (upTo <= from) (g, RunDone) // caught up
          else (g, IntentCas(g.src.pos, from, upTo))
      }
    case IntentCas(prev0, from, upTo) =>
      // commitWithRetry closure: first writer wins; a loser no-ops and the
      // outer loop re-reads (adopting whatever landed)
      if (g.src.intent.isEmpty && g.src.pos == prev0)
        (g.copy(src = g.src.copy(intent = Some((from, upTo)))), IntentRead)
      else (g, IntentRead)
    case ApplyRead(span, i) =>
      if (i >= g.dsts.size) (g, Complete(span))
      else {
        val prev = g.dsts(i).applied
        // at-or-beyond skip: spans are sequential per group, so a marker
        // whose from >= ours means ours was already applied here
        if (prev.exists(_._1 >= span._1)) (g, ApplyRead(span, i + 1))
        else (g, ApplyCas(span, i, prev))
      }
    case ApplyCas(span, i, prevApplied) =>
      val d = g.dsts(i)
      if (wEpoch < logEpoch) (g, RunAborted) // FencedException, both branches
      else if (route(span, i)) {
        // append with extraGuards: marker unchanged => data + marker land
        // in ONE commit; changed => ConcurrentCommitException, job dies
        if (d.applied == prevApplied) {
          val d2 = Dest(Some(span), d.delivered :+ span)
          (g.copy(dsts = g.dsts.updated(i, d2)), ApplyRead(span, i + 1))
        } else (g, RunAborted)
      } else {
        // empty routed slice: production STILL calls append() first, whose
        // extraGuards check throws on a lost compare (EsLog.scala, guard
        // check before the zero-row early return) — so this first atomic
        // observation aborts the run exactly like the data path; only the
        // SECOND step (the marker-alone commitWithRetry) no-ops silently
        if (d.applied == prevApplied) (g, ApplyCasEmpty(span, i, prevApplied))
        else (g, RunAborted)
      }
    case ApplyCasEmpty(span, i, prevApplied) =>
      val d = g.dsts(i)
      // the closure fences too (FencedException = abort, not no-op)
      if (wEpoch < logEpoch) (g, RunAborted)
      else if (d.applied == prevApplied) {
        val d2 = d.copy(applied = Some(span))
        (g.copy(dsts = g.dsts.updated(i, d2)), ApplyRead(span, i + 1))
      } else (g, ApplyRead(span, i + 1)) // rival applied at-or-beyond: continue
    case Complete(span) =>
      // one CAS: position + intent delete iff the intent is still ours;
      // a rival that completed first already produced the same outcome
      if (g.src.intent.contains(span)) {
        val s2 = g.src.copy(pos = Some(span._2), intent = None,
          completed = g.src.completed :+ span)
        (g.copy(src = s2), RunDone)
      } else (g, RunDone)
    case RunDone | RunAborted => (g, pc) // terminal for this run
  }

  /** Run one writer to completion with NO interference — the recovery job
    * every crash/abort schedule ends with. Loops runs until the source is
    * caught up and no intent is in flight. Deterministic; bounded. */
  def recover(g0: Global, route: (Span, Int) => Boolean,
              maxSteps: Int = 200): Global = {
    var g = g0
    var steps = 0
    while ((g.src.intent.nonEmpty ||
            g.src.pos.getOrElse(0L) < g.src.nextOffset) && steps < maxSteps) {
      var pc: Pc = IntentRead
      while (pc != RunDone && pc != RunAborted && steps < maxSteps) {
        val (g2, pc2) = step(g, pc, route); g = g2; pc = pc2; steps += 1
      }
      require(pc != RunAborted, "recovery with no rivals cannot lose a guard")
    }
    require(steps < maxSteps, s"recovery did not converge in $maxSteps steps")
    g
  }
}
