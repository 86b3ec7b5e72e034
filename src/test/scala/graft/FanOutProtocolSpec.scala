package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eslog.FanOutProtocol
import graft.eslog.FanOutProtocol._

/** EXHAUSTIVE model check of the fan-out intent/apply/complete protocol
  * (the reference's TLA+ scope — `docs/tlaplus/ElasticStream.tla:4-6` —
  * done as exhaustive Scala over [[FanOutProtocol]]'s pure transitions,
  * which mirror EsLog.fanOutRun store round-trip by store round-trip).
  *
  * Scope: 2 rival writers (same epoch, up to 2 job runs each), 2
  * destinations, 2 producer appends (so up to 2 sequential spans), plus a
  * CRASH action for each writer at every point — every interleaving of
  * those atomic steps is enumerated (DFS over the reachable state graph,
  * memoized). At EVERY reachable state: no destination ever holds
  * overlapping span deliveries (exactly-once is a safety property — it
  * must hold mid-schedule, not just at quiescence). At every TERMINAL
  * state (writers dead/exhausted, producer done): one interference-free
  * recovery run converges, after which the intent is cleared, the group
  * position covers the log head, the completed spans partition the
  * consumed range, and each destination's delivery sequence is EXACTLY
  * the completed spans its routing selects — nothing lost, nothing
  * doubled, regardless of where rivals raced or died.
  *
  * The live-system twins of these schedules (real Spark, real CAS log,
  * seeded crash injection at every boundary, true-concurrency rivals) are
  * EsLogSpec's fan-out suites; this spec closes the gap between "the
  * schedules we thought to seed" and "all of them".
  */
class FanOutProtocolSpec extends AnyFunSuite {

  /** Writer = program counter + job runs it may still start. */
  private case class W(pc: Pc, runsLeft: Int, crashed: Boolean) {
    def terminalRun: Boolean = pc == RunDone || pc == RunAborted
    def dead: Boolean = crashed || (terminalRun && runsLeft == 0)
  }
  private case class Node(g: Global, ws: Vector[W], produced: Int)

  private def noOverlap(d: Dest): Boolean = {
    val s = d.delivered.sortBy(_._1)
    s.zip(s.drop(1)).forall { case (a, b) => a._2 <= b._1 }
  }

  /** DFS over every schedule; returns (#states, #terminals checked).
    * `epochs(wi)` is writer wi's epoch vs a uniform `logEpoch` — a writer
    * below it is a fenced zombie whose destination applies all abort. */
  private def enumerate(maxProduce: Int, runsPerWriter: Int,
                        route: (Span, Int) => Boolean,
                        epochs: Vector[Long] = Vector(0L, 0L),
                        logEpoch: Long = 0L,
                        stepFn: (Global, Pc, (Span, Int) => Boolean, Long, Long)
                          => (Global, Pc) = FanOutProtocol.step): (Long, Long) = {
    val seen = scala.collection.mutable.HashSet[Node]()
    var terminals = 0L
    val stack = scala.collection.mutable.ArrayDeque[Node]()
    val init = Node(initial(2),
      Vector.fill(2)(W(IntentRead, runsPerWriter - 1, crashed = false)), 0)
    stack.append(init); seen += init
    while (stack.nonEmpty) {
      val n = stack.removeLast()
      // safety at EVERY state: no destination holds overlapping deliveries
      n.g.dsts.foreach(d => assert(noOverlap(d),
        s"double delivery: ${d.delivered} in $n"))
      var successors = List.empty[Node]
      // producer appends one record
      if (n.produced < maxProduce)
        successors ::= n.copy(
          g = n.g.copy(src = n.g.src.copy(nextOffset = n.g.src.nextOffset + 1)),
          produced = n.produced + 1)
      n.ws.indices.foreach { wi =>
        val w = n.ws(wi)
        if (!w.dead) {
          // crash: the writer stops forever, wherever it is
          successors ::= n.copy(ws = n.ws.updated(wi, w.copy(crashed = true)))
          // or take its next atomic step
          if (w.terminalRun) // start the next job run
            successors ::= n.copy(ws =
              n.ws.updated(wi, W(IntentRead, w.runsLeft - 1, crashed = false)))
          else {
            val (g2, pc2) = stepFn(n.g, w.pc, route, epochs(wi), logEpoch)
            successors ::= n.copy(g = g2, ws = n.ws.updated(wi, w.copy(pc = pc2)))
          }
        }
      }
      if (successors.isEmpty || (n.ws.forall(_.dead) && n.produced == maxProduce)) {
        // terminal: everything that will happen has; recovery must converge
        terminals += 1
        val g2 = FanOutProtocol.recover(n.g, route)
        assert(g2.src.intent.isEmpty, s"intent not cleared after recovery: $g2")
        assert(g2.src.pos.getOrElse(0L) == g2.src.nextOffset,
          s"position must reach the head: $g2")
        // completed spans partition [0, nextOffset)
        val comp = g2.src.completed
        assert(comp.headOption.forall(_._1 == 0L), s"first span must start at 0: $comp")
        assert(comp.zip(comp.drop(1)).forall { case (a, b) => a._2 == b._1 },
          s"spans must be contiguous: $comp")
        assert(comp.lastOption.map(_._2).getOrElse(0L) == g2.src.nextOffset,
          s"spans must cover the consumed range: $comp vs ${g2.src.nextOffset}")
        // each destination delivered EXACTLY its routed spans, in order
        g2.dsts.zipWithIndex.foreach { case (d, i) =>
          assert(d.delivered == comp.filter(route(_, i)),
            s"dest $i: delivered ${d.delivered}, expected routed of $comp")
        }
      }
      successors.foreach { s => if (seen.add(s)) stack.append(s) }
    }
    (seen.size.toLong, terminals)
  }

  test("every schedule, all-destinations routing: exactly-once + clearance") {
    val (states, terminals) = enumerate(maxProduce = 2, runsPerWriter = 2,
      route = (_, _) => true)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L, "the enumeration must actually branch")
    assert(terminals > 100L)
  }

  test("every schedule, one destination routed empty for the first span") {
    // exercises the empty-route marker advance (the commitWithRetry branch
    // whose compare failure silently continues instead of aborting): dest 1
    // receives no data for any span starting at offset 0
    val route: (Span, Int) => Boolean = (s, i) => !(i == 1 && s._1 == 0L)
    val (states, terminals) = enumerate(maxProduce = 2, runsPerWriter = 2, route)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L)
    assert(terminals > 100L)
  }

  test("every schedule with a fenced ZOMBIE rival: it can adopt/complete but never corrupt") {
    // writer 1 runs at epoch 1 against logs fenced to epoch 2: every
    // destination apply it attempts aborts (FencedException in production
    // — BOTH the data-append and the empty-route commit fence), yet phase
    // 1 and phase 3 deliberately do not fence, so the zombie may cut an
    // intent, adopt one, skip at-or-beyond markers, and even COMPLETE an
    // intent the live writer fully applied — convergence to the fixed
    // outcome. Every terminal schedule must still end exactly-once with
    // the intent cleared (recovery runs live).
    val (states, terminals) = enumerate(maxProduce = 2, runsPerWriter = 2,
      route = (_, _) => true, epochs = Vector(2L, 1L), logEpoch = 2L)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 500L)
    assert(terminals > 50L)
  }

  test("deeper scope (3 appends, 3 runs each): still exactly-once everywhere") {
    // one size up from the TLA+-scope config — catches invariants that only
    // break at the third sequential span (e.g. a marker comparison that
    // accidentally used equality instead of at-or-beyond)
    val (states, terminals) = enumerate(maxProduce = 3, runsPerWriter = 3,
      route = (_, _) => true)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 10000L)
  }

  test("MUTATION: an exact-match-only marker skip is caught — the enumeration has teeth") {
    // Guard against a vacuously-green model check: weaken the one rule the
    // production scaladoc calls out as load-bearing (the AT-OR-BEYOND
    // marker skip, EsLog's `prevApplied.exists(_._1 >= from)`) into an
    // exact-match skip, and the enumeration MUST find the double delivery:
    // a straggler adopting span s1 after a rival completed it and applied
    // s2 sees marker=s2 (not an exact match), re-applies s1, and the
    // marker guard passes because s2 IS the straggler's legitimate compare
    // base. If this test ever goes green, the harness stopped checking.
    def buggyStep(g: Global, pc: Pc, route: (Span, Int) => Boolean,
                  wEpoch: Long, logEpoch: Long): (Global, Pc) = pc match {
      case ApplyRead(span, i) if i < g.dsts.size =>
        val prev = g.dsts(i).applied
        if (prev.contains(span)) (g, ApplyRead(span, i + 1)) // exact only — THE BUG
        else (g, ApplyCas(span, i, prev))
      case _ => FanOutProtocol.step(g, pc, route, wEpoch, logEpoch)
    }
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(maxProduce = 2, runsPerWriter = 2, route = (_, _) => true,
        stepFn = buggyStep)
    }
    assert(e.getMessage.contains("double delivery") ||
      e.getMessage.contains("delivered"), e.getMessage)
  }

  test("a single uninterfered run delivers one span everywhere and completes") {
    // sanity pin of the model itself against the protocol's happy path
    var g = initial(2).copy(src = Source(None, None, 2L, Vector.empty))
    var pc: Pc = IntentRead
    val trace = scala.collection.mutable.ArrayBuffer[Pc]()
    while (pc != RunDone && pc != RunAborted) {
      trace += pc
      val r = FanOutProtocol.step(g, pc, (_, _) => true); g = r._1; pc = r._2
    }
    assert(pc == RunDone)
    assert(g.src.pos.contains(2L) && g.src.intent.isEmpty)
    assert(g.src.completed == Vector((0L, 2L)))
    assert(g.dsts.forall(_.delivered == Vector((0L, 2L))))
    // the trace walks intent-read -> cas -> re-read(adopt) -> 2 applies -> complete
    assert(trace.count(_.isInstanceOf[ApplyCas]) == 2)
  }
}
