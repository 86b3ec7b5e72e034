package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eslog.FanInProtocol
import graft.eslog.FanInProtocol._

/** EXHAUSTIVE model check of the fan-in (N→1) / 1→1 guarded single-CAS
  * commit — [[FanInProtocol]]'s pure transitions, which mirror
  * `EsLog.consumeProcessProduceMulti` store round-trip by store
  * round-trip (the [[graft.eslog.FanOutProtocol]] harness applied to the
  * other ETL commit shape; the r9 review found a REAL same-epoch
  * double-produce in this family, which is exactly the race class this
  * enumeration closes).
  *
  * Scope: 2 rival writers (same epoch, up to 2 job runs each), 2 sources
  * (the 1→1 path is the N=1 config, enumerated separately), up to 2
  * producer appends spread over the sources, plus a CRASH action for each
  * writer at every point — DFS over every interleaving of those atomic
  * steps. At EVERY reachable state: no source's consumed spans overlap
  * (exactly-once is a safety property — it must hold mid-schedule). At
  * every TERMINAL state: one interference-free recovery run converges,
  * positions cover every head, and each source's consumed spans are
  * contiguous from 0 — nothing lost, nothing doubled, wherever rivals
  * raced or died.
  *
  * The live-system twins (real Spark, real CAS log, true-concurrency
  * rivals, seeded crashes) are EsLogSpec's etl suites; this spec closes
  * the gap between "the schedules we thought to seed" and "all of them".
  */
class FanInProtocolSpec extends AnyFunSuite {

  private case class W(pc: Pc, runsLeft: Int, crashed: Boolean) {
    def terminalRun: Boolean = pc == RunDone || pc == RunAborted
    def dead: Boolean = crashed || (terminalRun && runsLeft == 0)
  }
  private case class Node(g: Global, ws: Vector[W], produced: Int)

  /** Per-source non-overlap of consumed spans, in commit order. */
  private def noOverlap(g: Global, nSrcs: Int): Boolean =
    (0 until nSrcs).forall { i =>
      val spans = g.dst.consumed.flatMap(_.lift(i)).filter(s => s._2 > s._1)
      spans.zip(spans.drop(1)).forall { case (a, b) => a._2 <= b._1 }
    }

  /** DFS over every schedule; returns (#states, #terminals checked).
    * `consumed` bundles record the FULL per-source span vector per commit
    * ((f, f) entries keep source indices aligned). */
  private def enumerate(nSrcs: Int, maxProduce: Int, runsPerWriter: Int,
                        nonEmptyOut: Vector[Span] => Boolean,
                        epochs: Vector[Long] = Vector(0L, 0L),
                        logEpoch: Long = 0L,
                        stepFn: (Global, Pc, Vector[Span] => Boolean, Long, Long)
                          => (Global, Pc) = FanInProtocol.step): (Long, Long) = {
    val seen = scala.collection.mutable.HashSet[Node]()
    var terminals = 0L
    val stack = scala.collection.mutable.ArrayDeque[Node]()
    val init = Node(initial(nSrcs),
      Vector.fill(2)(W(ReadSrc(0, Vector.empty), runsPerWriter - 1, crashed = false)), 0)
    stack.append(init); seen += init
    while (stack.nonEmpty) {
      val n = stack.removeLast()
      // safety at EVERY state
      assert(noOverlap(n.g, nSrcs), s"double consume: ${n.g.dst.consumed} in $n")
      var successors = List.empty[Node]
      // producer appends one record to any source
      if (n.produced < maxProduce)
        (0 until nSrcs).foreach { j =>
          successors ::= n.copy(
            g = n.g.copy(heads = n.g.heads.updated(j, n.g.heads(j) + 1)),
            produced = n.produced + 1)
        }
      n.ws.indices.foreach { wi =>
        val w = n.ws(wi)
        if (!w.dead) {
          successors ::= n.copy(ws = n.ws.updated(wi, w.copy(crashed = true)))
          if (w.terminalRun)
            successors ::= n.copy(ws =
              n.ws.updated(wi, W(ReadSrc(0, Vector.empty), w.runsLeft - 1, crashed = false)))
          else {
            val (g2, pc2) = stepFn(n.g, w.pc, nonEmptyOut, epochs(wi), logEpoch)
            successors ::= n.copy(g = g2, ws = n.ws.updated(wi, w.copy(pc = pc2)))
          }
        }
      }
      if (successors.isEmpty || (n.ws.forall(_.dead) && n.produced == maxProduce)) {
        terminals += 1
        val g2 = FanInProtocol.recover(n.g, nonEmptyOut)
        // positions reach every head
        g2.dst.pos.zip(g2.heads).foreach { case (p, h) =>
          assert(p.getOrElse(0L) == h, s"position must reach the head: $g2") }
        // per source: consumed spans contiguous from 0, covering [0, head)
        (0 until nSrcs).foreach { i =>
          val spans = g2.dst.consumed.flatMap(_.lift(i)).filter(s => s._2 > s._1)
          assert(spans.headOption.forall(_._1 == 0L),
            s"src $i: first span must start at 0: $spans")
          assert(spans.zip(spans.drop(1)).forall { case (a, b) => a._2 == b._1 },
            s"src $i: spans must be contiguous: $spans")
          assert(spans.lastOption.map(_._2).getOrElse(0L) == g2.heads(i),
            s"src $i: spans must cover [0, ${g2.heads(i)}): $spans")
        }
      }
      successors.foreach { s => if (seen.add(s)) stack.append(s) }
    }
    (seen.size.toLong, terminals)
  }

  test("1→1 (consumeProcessProduce shape): every schedule is exactly-once") {
    val (states, terminals) = enumerate(nSrcs = 1, maxProduce = 2,
      runsPerWriter = 2, nonEmptyOut = _ => true)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 500L, "the enumeration must actually branch")
    assert(terminals > 50L)
  }

  test("fan-in 2→1: every schedule is exactly-once on BOTH sources") {
    val (states, terminals) = enumerate(nSrcs = 2, maxProduce = 2,
      runsPerWriter = 2, nonEmptyOut = _ => true)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L)
    assert(terminals > 100L)
  }

  test("fan-in with the all-filtered (empty-output) route: positions advance, never rewind") {
    // every commit takes the empty route: CommitData's guard check (append
    // still checks extraGuards before its zero-row return) then the
    // positions-alone commitWithRetry whose lost compare silently no-ops
    val (states, terminals) = enumerate(nSrcs = 2, maxProduce = 2,
      runsPerWriter = 2, nonEmptyOut = _ => false)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L)
    assert(terminals > 100L)
  }

  test("mixed route: output empty iff source 0 contributes nothing") {
    val route: Vector[Span] => Boolean = spans => spans.head._2 > spans.head._1
    val (states, terminals) = enumerate(nSrcs = 2, maxProduce = 2,
      runsPerWriter = 2, nonEmptyOut = route)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L)
  }

  test("fenced ZOMBIE rival: every apply aborts, schedules still converge exactly-once") {
    val (states, terminals) = enumerate(nSrcs = 2, maxProduce = 2,
      runsPerWriter = 2, nonEmptyOut = _ => true,
      epochs = Vector(2L, 1L), logEpoch = 2L)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 500L)
    assert(terminals > 50L)
  }

  test("MUTATION: dropping the position guard is caught — the enumeration has teeth") {
    // Weaken the one rule the production scaladoc calls load-bearing: the
    // extraGuards position compare in the single CAS ("two same-epoch
    // instances racing the same slice can otherwise both append — double
    // produce"). Without it, two rivals that read the same positions both
    // commit their data + positions, and the second commit re-consumes the
    // first's span. The safety check must find that double consume. If
    // this test ever goes green, the harness stopped checking.
    def buggyStep(g: Global, pc: Pc, nonEmptyOut: Vector[Span] => Boolean,
                  wEpoch: Long, logEpoch: Long): (Global, Pc) = pc match {
      case CommitData(prevs, spans) if wEpoch >= logEpoch && nonEmptyOut(spans) =>
        // THE BUG: no `g.dst.pos != prevs` abort — commit unconditionally
        val pos2 = g.dst.pos.zip(spans).map { case (p, (f, u)) =>
          if (u > f) Some(u) else p }
        (g.copy(dst = Dst(pos2, g.dst.consumed :+ spans)), RunDone)
      case _ => FanInProtocol.step(g, pc, nonEmptyOut, wEpoch, logEpoch)
    }
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(nSrcs = 1, maxProduce = 2, runsPerWriter = 2,
        nonEmptyOut = _ => true, stepFn = buggyStep)
    }
    assert(e.getMessage.contains("double consume") ||
      e.getMessage.contains("contiguous") || e.getMessage.contains("cover"),
      e.getMessage)
  }

  test("MUTATION: a torn per-key destination read is caught (the one-snapshot rule)") {
    // Production takes ONE MetaLog.load(dstDir).kv snapshot for all N
    // positions, with a comment saying a per-key load could see a torn
    // view. Model the torn read: each position read separately, with a
    // rival able to commit between them — the stale first key becomes a
    // compare base that no longer reflects the commit the second key saw,
    // and a double consume or coverage gap must surface.
    def tornStep(g: Global, pc: Pc, nonEmptyOut: Vector[Span] => Boolean,
                 wEpoch: Long, logEpoch: Long): (Global, Pc) = pc match {
      case ReadDst(upTos) =>
        // torn: key 0 read from the CURRENT state, key 1 deferred — model
        // as reading key 0 now and key 1 at commit time via a poisoned
        // prev that CommitData will refresh (the classic torn-read shape)
        val prevs = g.dst.pos
        val froms = prevs.map(_.getOrElse(0L))
        if (froms.zip(upTos).exists { case (f, u) => f > u }) (g, Refresh(prevs, upTos))
        else {
          val spans = froms.zip(upTos)
          if (spans.forall { case (f, u) => u <= f }) (g, RunDone)
          else (g, CommitData(prevs, spans))
        }
      case CommitData(prevs, spans) if wEpoch >= logEpoch && nonEmptyOut(spans) =>
        // THE BUG: guard only key 0 (the torn read left key 1 unguarded)
        if (g.dst.pos.headOption != prevs.headOption) (g, RunAborted)
        else {
          val pos2 = g.dst.pos.zip(spans).map { case (p, (f, u)) =>
            if (u > f) Some(u) else p }
          (g.copy(dst = Dst(pos2, g.dst.consumed :+ spans)), RunDone)
        }
      case _ => FanInProtocol.step(g, pc, nonEmptyOut, wEpoch, logEpoch)
    }
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(nSrcs = 2, maxProduce = 2, runsPerWriter = 2,
        nonEmptyOut = _ => true, stepFn = tornStep)
    }
    assert(e.getMessage.contains("double consume") ||
      e.getMessage.contains("contiguous") || e.getMessage.contains("cover"),
      e.getMessage)
  }

  test("deeper scope (3 appends, 3 runs each, 2 sources): still exactly-once everywhere") {
    val (states, terminals) = enumerate(nSrcs = 2, maxProduce = 3,
      runsPerWriter = 3, nonEmptyOut = _ => true)
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 10000L)
  }

  test("a single uninterfered 2→1 run consumes both heads and records one bundle") {
    var g = initial(2).copy(heads = Vector(2L, 1L))
    var pc: Pc = ReadSrc(0, Vector.empty)
    while (pc != RunDone && pc != RunAborted) {
      val r = FanInProtocol.step(g, pc, _ => true); g = r._1; pc = r._2
    }
    assert(pc == RunDone)
    assert(g.dst.pos == Vector(Some(2L), Some(1L)))
    assert(g.dst.consumed == Vector(Vector((0L, 2L), (0L, 1L))))
    assert(noOverlap(g, 2))
  }
}
