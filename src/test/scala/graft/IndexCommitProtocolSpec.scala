package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IndexCommitProtocol
import graft.operators.IndexCommitProtocol._

/** EXHAUSTIVE model check of the persisted-index maintenance protocol —
  * [[IndexCommitProtocol]]'s pure transitions, which mirror
  * `IndexCommit.appendTree` / `compactTrees` / `commitBase` store
  * round-trip by store round-trip (the FanOut/FanIn harness applied to the
  * third commit protocol in the engine; the r12 self-review found TWO real
  * silent-corruption classes in this family — row duplication under rival
  * compacts, stale-sidecar rows under rebuild-racing-append — and the
  * mutation tests below pin both as caught).
  *
  * Scope per config: 3–5 maintenance jobs (appenders with distinct or
  * deliberately DUPLICATED batch ids — the foreachBatch-retry twin —
  * compactors, and rebuilders), each with a CRASH action at every point —
  * DFS over every interleaving of the atomic steps. At EVERY reachable
  * state: no committed snapshot (ANY version a reader may hold) contains a
  * row label twice, references a deleted tree, or mixes sidecar
  * GENERATIONS (every live tree derived against the snapshot's own
  * baseVersion). At every TERMINAL state: the latest snapshot holds
  * exactly its generation's base + each applied batch once, completed
  * appends are durable (rebuild-free configs), and vacuum reclaims
  * precisely the unreferenced trees without touching the live content.
  *
  * The live-system twins (real Spark, real CAS log, hook-injected rivals)
  * are IndexCommitSpec's rivalry/fence suites; this spec closes the gap
  * between "the schedules we thought to seed" and "all of them".
  */
class IndexCommitProtocolSpec extends AnyFunSuite {

  private case class W(pc: Pc, crashed: Boolean) {
    def dead: Boolean = crashed || pc.isInstanceOf[Done] || pc == Aborted
  }
  private case class Node(g: Global, ws: Vector[W])

  /** Every committed snapshot must stay readable, duplicate-free, and
    * generation-pure. */
  private def safety(g: Global): Unit = {
    g.log.indices.foreach { v =>
      val e = g.log(v)
      assert(e.dirs.forall(g.disk.contains),
        s"commit v$v references a deleted tree: $e disk=${g.disk.keySet}")
      val c = content(g, v)
      assert(c.distinct.size == c.size,
        s"committed snapshot v$v holds a row twice: $c")
      assert(e.dirs.forall(t => g.disk(t).gen == e.baseVersion),
        s"committed snapshot v$v mixes sidecar generations: " +
          s"${e.dirs.map(t => t -> g.disk(t).gen)} vs base ${e.baseVersion}")
    }
  }

  /** DFS over every schedule of `jobs` (+ crash at every point). Returns
    * (#states, #terminals, #aborts-observed, #replay-skips-observed). */
  private def enumerate(jobs: Vector[Pc], compactGuard: Boolean = true,
                        replayRecheck: Boolean = true,
                        rebuildFence: Boolean = true)
      : (Long, Long, Long, Long) = {
    val withRebuild = jobs.contains(BLoad)
    val seen = scala.collection.mutable.HashSet[Node]()
    var terminals = 0L
    var aborts = 0L
    var skips = 0L
    val stack = scala.collection.mutable.ArrayDeque[Node]()
    val init = Node(initial, jobs.map(W(_, crashed = false)))
    stack.append(init); seen += init
    while (stack.nonEmpty) {
      val n = stack.removeLast()
      safety(n.g)
      var successors = List.empty[Node]
      n.ws.indices.foreach { wi =>
        val w = n.ws(wi)
        if (!w.dead) {
          successors ::= n.copy(ws = n.ws.updated(wi, w.copy(crashed = true)))
          val (g2, pc2) = step(n.g, w.pc, compactGuard, replayRecheck,
            rebuildFence)
          successors ::= n.copy(g = g2, ws = n.ws.updated(wi, w.copy(pc = pc2)))
        }
      }
      if (successors.isEmpty) {
        terminals += 1
        aborts += n.ws.count(_.pc == Aborted)
        skips += n.ws.count(_.pc == Done(false))
        val g = n.g
        // the latest snapshot: its generation's base + every applied batch,
        // each exactly once
        val c = content(g, g.latestVersion)
        assert(c.sorted ==
          ("base" +: g.latest.batchIds.toVector).sorted,
          s"latest snapshot must hold base + applied batches once: $c vs ${g.latest}")
        // durability: a COMPLETED append run implies its batch is applied —
        // except under a rebuild, which legitimately subsumes prior appends
        // (batch ids reset by design)
        if (!withRebuild) n.ws.zip(jobs).foreach {
          case (W(Done(_), false), ALoad(b)) =>
            assert(g.latest.batchIds.contains(b),
              s"completed append of $b must be durable: ${g.latest}")
          case _ => ()
        }
        // vacuum at quiescence: reclaims exactly the unreferenced trees,
        // live content untouched
        val (g2, dead) = IndexCommitProtocol.vacuum(g)
        assert(dead == g.disk.keySet.diff(g.latest.dirs.toSet))
        assert(g2.latest.dirs.forall(g2.disk.contains))
        assert(content(g2, g2.latestVersion) == c)
      }
      successors.foreach { s => if (seen.add(s)) stack.append(s) }
    }
    (seen.size.toLong, terminals, aborts, skips)
  }

  test("2 appends (distinct batches) × 1 compact: every schedule converges, nothing doubled or lost") {
    val (states, terminals, _, _) = enumerate(
      Vector(ALoad("b1"), ALoad("b2"), CLoad))
    info(s"explored $states states, checked $terminals terminal schedules")
    assert(states > 1000L, "the enumeration must actually branch")
    assert(terminals > 100L)
  }

  test("duplicated batch delivery (foreachBatch retry) × compact: the replay guard holds under every interleaving") {
    val (states, terminals, _, skips) = enumerate(
      Vector(ALoad("b1"), ALoad("b1"), CLoad))
    info(s"explored $states states, $terminals terminals, $skips replay skips")
    assert(states > 500L)
    assert(skips > 0L, "some schedule must exercise the replay-skip route")
  }

  test("rival compacts × append: the source-tree guard aborts the loser in every racing schedule") {
    val (states, terminals, aborts, _) = enumerate(
      Vector(ALoad("b1"), CLoad, CLoad))
    info(s"explored $states states, $terminals terminals, $aborts loud aborts")
    assert(states > 500L)
    assert(aborts > 0L, "some schedule must exercise the rival-compact abort")
  }

  test("rebuild × append × compact: the generation fence keeps every snapshot sidecar-pure") {
    val (states, terminals, aborts, _) = enumerate(
      Vector(ALoad("b1"), CLoad, BLoad))
    info(s"explored $states states, $terminals terminals, $aborts loud aborts")
    assert(states > 500L)
    assert(aborts > 0L, "some schedule must exercise the rebuild fence")
  }

  test("deeper config: 2 appends (one duplicated) × 2 rival compacts") {
    val (states, terminals, aborts, skips) = enumerate(
      Vector(ALoad("b1"), ALoad("b1"), ALoad("b2"), CLoad, CLoad))
    info(s"explored $states states, $terminals terminals, " +
      s"$aborts aborts, $skips skips")
    assert(states > 10000L)
    assert(aborts > 0L && skips > 0L)
  }

  test("deeper config: duplicated appends × compact × rebuild") {
    val (states, terminals, aborts, skips) = enumerate(
      Vector(ALoad("b1"), ALoad("b1"), CLoad, BLoad))
    info(s"explored $states states, $terminals terminals, " +
      s"$aborts aborts, $skips skips")
    assert(states > 5000L)
    assert(aborts > 0L && skips > 0L)
  }

  test("MUTATION: dropping the rival-compact guard must surface row duplication") {
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(Vector(ALoad("b1"), CLoad, CLoad), compactGuard = false)
    }
    assert(e.getMessage.contains("holds a row twice"), e.getMessage)
  }

  test("MUTATION: dropping append's post-lost-CAS replay re-check must surface a double apply") {
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(Vector(ALoad("b1"), ALoad("b1"), CLoad), replayRecheck = false)
    }
    assert(e.getMessage.contains("holds a row twice") ||
      e.getMessage.contains("once"), e.getMessage)
  }

  test("MUTATION: dropping the rebuild fence must surface generation mixing") {
    val e = intercept[org.scalatest.exceptions.TestFailedException] {
      enumerate(Vector(ALoad("b1"), BLoad), rebuildFence = false)
    }
    assert(e.getMessage.contains("mixes sidecar generations"), e.getMessage)
  }
}
