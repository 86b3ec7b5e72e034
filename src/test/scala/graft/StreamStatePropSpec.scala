package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.meta._

/** Property tests for the stream state machine: arbitrary interleavings of
  * valid and invalid actions, folded through [[StreamState.apply]], must
  * never produce a state that violates the reference's range/window
  * invariants (components/model/src/range/mod.rs:9-42, store window rules
  * window.rs:79-204) — invalid actions may throw (they are rejected), but
  * the surviving state must always be consistent.
  *
  * ScalaCheck generators are driven with explicit deterministic seeds (the
  * scalatest bridge artifact is not available offline), so failures
  * reproduce exactly by seed.
  */
class StreamStatePropSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default.withSize(10)

  private def fm(start: Long, end: Long, tag: String): FileMeta =
    FileMeta(s"f-$tag-$start", end - start, 10L, start, end, 0L, 0L)

  /** One step: from the current state, generate a plausible action — mostly
    * valid (built from the folded state), sometimes garbage (random offsets
    * and epochs) so rejection paths are exercised too. */
  private def genAction(s: StreamState, tag: Int): Gen[Action] = {
    val next = s.nextOffset
    val epoch = s.epoch
    val validCommit = Gen.choose(1L, 50L).map(n =>
      CommitFiles(s.openSegment.map(_.index).getOrElse(0), epoch,
        Seq(fm(next, next + n, tag.toString))))
    val validOpenSeg = Gen.const(OpenSegment(
      s.segments.lastOption.map(_.index + 1).getOrElse(0), next, epoch))
    val validSeal = Gen.const(
      s.openSegment.map(seg => SealSegment(seg.index, seg.confirmedEnd, epoch))
        .getOrElse(OpenStream(epoch + 1)))
    val validOpen = Gen.const(OpenStream(epoch + 1))
    val validTrim = Gen.choose(s.startOffset, math.max(s.startOffset, next)).map(Trim(_))
    val garbage = for {
      off <- Gen.choose(-5L, next + 100)
      e <- Gen.choose(-1L, epoch + 2)
      n <- Gen.choose(0L, 20L)
      idx <- Gen.choose(0, 3)
      a <- Gen.oneOf[Action](
        CommitFiles(idx, e, Seq(fm(off, off + n, s"g$tag"))),
        OpenSegment(idx, off, e),
        SealSegment(0, off, e),
        Trim(off),
        OpenStream(e))
    } yield a
    val kvKeys = Gen.oneOf("a", "ab", "b", "c")
    val kvAction = Gen.frequency[Action](
      3 -> kvKeys.map(k => KvPut(k, s"v$tag")),
      1 -> kvKeys.map(KvDel(_)),
      1 -> (for { f <- kvKeys; u <- Gen.option(kvKeys) } yield KvDelRange(f, u)))
    Gen.frequency(
      5 -> validCommit, 2 -> validOpenSeg, 1 -> validSeal,
      1 -> validOpen, 1 -> validTrim, 2 -> kvAction, 3 -> garbage)
  }

  /** Invariants that must hold for EVERY state reachable through apply. */
  private def checkInvariants(s: StreamState): Unit = {
    // segment chain: consecutive indexes, start = previous sealed end, and
    // only the last segment may be open
    s.segments.sliding(2).foreach {
      case Vector(a, b) =>
        assert(b.index == a.index + 1, s"indexes not consecutive: ${a.index}, ${b.index}")
        assert(a.sealed_, s"non-last segment ${a.index} not sealed")
        assert(b.start == a.sealedEnd.get, s"segment ${b.index} start != prev end")
      case _ => ()
    }
    // files within a segment: adjacent (gap-free) and inside the span
    s.segments.foreach { seg =>
      seg.files.sliding(2).foreach {
        case Vector(a, b) =>
          assert(a.endOffset == b.startOffset, s"file gap in segment ${seg.index}")
        case _ => ()
      }
      seg.files.foreach { f =>
        assert(f.startOffset >= seg.start, "file below segment start")
        seg.sealedEnd.foreach(e => assert(f.endOffset <= e, "file past sealed end"))
      }
      seg.sealedEnd.foreach(e => assert(seg.confirmedEnd <= e, "confirmed past sealed end"))
    }
    // epoch never below any segment epoch is NOT required (segments keep
    // their creation epoch); but the readable window must be well-formed
    assert(s.nextOffset >= s.startOffset || s.allFiles.isEmpty,
      s"nextOffset ${s.nextOffset} < startOffset ${s.startOffset}")
  }

  private def step(s: StreamState, action: Action, v: Long): (StreamState, Long) =
    try (StreamState.apply(s, action, v), v + 1)
    catch {
      // rejections are part of the protocol (window.rs-style errors); the
      // immutable fold means state is unchanged on throw
      case _: FencedException | _: SealedException |
           _: OutOfOrderException | _: CommittedException => (s, v)
      case _: IllegalArgumentException => (s, v)
    }

  test("random action interleavings never violate contiguity/fencing invariants") {
    (0 until 300).foreach { run =>
      var s = StreamState.apply(StreamState.empty, CreateStream(run.toLong, 1, 1, -1L), 0)
      s = StreamState.apply(s, OpenStream(1L), 1)
      var v = 2L
      var monotoneNext = s.nextOffset
      (0 until 40).foreach { i =>
        val action = genAction(s, i)(params, Seed(run.toLong * 1000 + i))
          .getOrElse(Trim(s.startOffset))
        val (s2, v2) = step(s, action, v)
        s = s2; v = v2
        checkInvariants(s)
        assert(s.nextOffset >= monotoneNext, s"nextOffset went backwards (run $run step $i)")
        monotoneNext = s.nextOffset
      }
    }
  }

  test("kv fold matches a reference map model (incl. ranged tombstones)") {
    // keys chosen to exercise prefix ordering and the unbounded-until case
    val keys = Vector("a", "ab", "b", "bb", "c", "￿-hi")
    val genKv: Gen[Action] = for {
      pick <- Gen.choose(0, 9)
      k <- Gen.oneOf(keys)
      u <- Gen.option(Gen.oneOf(keys))
    } yield
      if (pick < 5) KvPut(k, s"v$pick")
      else if (pick < 7) KvDel(k)
      else KvDelRange(k, u)
    (0 until 200).foreach { run =>
      var s = StreamState.apply(StreamState.empty, CreateStream(1L, 1, 1, -1L), 0)
      var model = Map.empty[String, String]
      var v = 1L
      (0 until 30).foreach { i =>
        val a = genKv(params, Seed(run * 31337L + i)).getOrElse(KvPut("a", "x"))
        s = StreamState.apply(s, a, v); v += 1
        // the spec, stated independently: delete every key in [from, until)
        model = a match {
          case KvPut(k, value)    => model + (k -> value)
          case KvDel(k)           => model - k
          case KvDelRange(f, u)   => model.filterNot { case (k, _) => k >= f && u.forall(k < _) }
          case _                  => model
        }
        assert(s.kv == model, s"kv fold diverged from model (run $run step $i, action $a)")
      }
    }
  }

  test("fold is deterministic and replayable: same action log, same state") {
    (0 until 100).foreach { run =>
      def build(): (StreamState, Seq[Action]) = {
        var s = StreamState.apply(StreamState.empty, CreateStream(1L, 1, 1, -1L), 0)
        s = StreamState.apply(s, OpenStream(1L), 1)
        val applied = Seq.newBuilder[Action]
        var v = 2L
        (0 until 30).foreach { i =>
          val a = genAction(s, i)(params, Seed(run.toLong * 7919 + i))
            .getOrElse(Trim(s.startOffset))
          try { s = StreamState.apply(s, a, v); applied += a; v += 1 }
          catch { case scala.util.control.NonFatal(_) => () }
        }
        (s, applied.result())
      }
      val (s1, log1) = build()
      val (s2, log2) = build()
      assert(log1 == log2 && s1 == s2, s"nondeterministic fold (run $run)")
      // replaying only the ACCEPTED actions from empty reproduces the state —
      // the recovery guarantee the metadata log relies on
      val replayed = log1.zipWithIndex.foldLeft(
        StreamState.apply(
          StreamState.apply(StreamState.empty, CreateStream(1L, 1, 1, -1L), 0),
          OpenStream(1L), 1)) {
        case (acc, (a, i)) => StreamState.apply(acc, a, 2L + i)
      }
      assert(replayed == s1, s"replay diverged (run $run)")
    }
  }
}
