package graft.meta

/** A segment (= the reference's Range, components/model/src/range/mod.rs:9-42):
  * half-open offset interval `[start, end)`, immutable once sealed
  * (`end = Some`), mutable while open (`end = None` means writes may extend
  * it past `confirmedEnd`).
  */
final case class SegmentState(
    index: Int,
    start: Long,
    epoch: Long,
    sealedEnd: Option[Long],
    files: Vector[FileMeta]
) {
  /** Highest contiguous committed offset (the reference's confirm offset,
    * replication_range.rs:153-175 with quorum collapsed to "durably written"). */
  def confirmedEnd: Long = files.lastOption.map(_.endOffset).getOrElse(start)
  def sealed_ : Boolean = sealedEnd.isDefined
  /** contains per range/mod.rs:203-232: open segment contains all >= start. */
  def contains(offset: Long): Boolean =
    offset >= start && sealedEnd.forall(offset < _)
}

/** Folded view of a stream's metadata log. */
final case class StreamState(
    streamId: Long,
    replica: Int,
    ackCount: Int,
    retentionMs: Long,
    epoch: Long,
    startOffset: Long,                 // post-trim minimum readable offset
    segments: Vector[SegmentState],
    kv: Map[String, String],
    deleted: Boolean,
    version: Long                      // last applied log version
) {
  def nextOffset: Long =
    segments.lastOption.map(s => s.sealedEnd.getOrElse(s.confirmedEnd)).getOrElse(startOffset)

  def openSegment: Option[SegmentState] = segments.lastOption.filter(!_.sealed_)

  /** All committed files whose offset span intersects [from, until). */
  def filesInRange(from: Long, until: Long): Seq[FileMeta] =
    segments.flatMap(_.files).filter(f => f.endOffset > from && f.startOffset < until)

  def allFiles: Seq[FileMeta] = segments.flatMap(_.files)
}

object StreamState {
  def empty: StreamState =
    StreamState(-1L, 1, 1, -1L, 0L, 0L, Vector.empty, Map.empty, deleted = false, version = -1L)

  /** Apply one action; throws the window.rs-style rejection errors on invariant
    * violations. This is the single place the reference's range/window rules
    * are enforced.
    */
  def apply(s: StreamState, a: Action, version: Long): StreamState = {
    val next = a match {
      case CreateStream(id, replica, ack, retention) =>
        require(s.streamId < 0, s"stream already created (id=${s.streamId})")
        s.copy(streamId = id, replica = replica, ackCount = ack, retentionMs = retention)

      case OpenStream(epoch) =>
        // Fencing: a new writer must present a strictly higher epoch
        // (OpenStreamOptions epoch semantics; replication_stream.rs:241-295).
        if (epoch <= s.epoch && s.epoch > 0)
          throw new FencedException(s"epoch $epoch <= current ${s.epoch}")
        // Seal-on-open recovery: the previous open segment is fenced at its
        // confirmed end so readers never see past committed data.
        val segs = s.segments.lastOption match {
          case Some(seg) if !seg.sealed_ =>
            s.segments.init :+ seg.copy(sealedEnd = Some(seg.confirmedEnd))
          case _ => s.segments
        }
        s.copy(epoch = epoch, segments = segs)

      case OpenSegment(index, start, epoch) =>
        // CREATE_RANGE invariants (range.go:188-240): previous sealed,
        // index = last+1, start = last end, epoch >= stream epoch.
        if (epoch < s.epoch) throw new FencedException(s"segment epoch $epoch < stream epoch ${s.epoch}")
        s.segments.lastOption match {
          case Some(last) =>
            if (!last.sealed_) throw new SealedException(s"segment ${last.index} still open")
            require(index == last.index + 1, s"segment index $index != ${last.index + 1}")
            require(start == last.sealedEnd.get, s"segment start $start != ${last.sealedEnd.get}")
          case None =>
            require(start == s.startOffset, s"first segment start $start != ${s.startOffset}")
        }
        s.copy(segments = s.segments :+ SegmentState(index, start, epoch, None, Vector.empty))

      case CommitFiles(index, epoch, files) =>
        if (epoch < s.epoch) throw new FencedException(s"commit epoch $epoch < stream epoch ${s.epoch}")
        val seg = s.segments.lastOption.getOrElse(
          throw new OutOfOrderException("no open segment"))
        require(seg.index == index, s"commit to segment $index but open is ${seg.index}")
        if (seg.sealed_) throw new SealedException(s"segment $index sealed")
        require(files.nonEmpty, "empty commit")
        // Window contiguity (window.rs:79-204): the committed span must attach
        // exactly at confirmedEnd and be internally gap-free.
        val sorted = files.sortBy(_.startOffset)
        val first = sorted.head.startOffset
        if (first < seg.confirmedEnd) {
          // Idempotent retry of an already-committed span is a no-op
          // (APPEND_TO_COMMITTED_OFFSET, rpc.fbs:40-41).
          if (sorted.last.endOffset <= seg.confirmedEnd)
            throw new CommittedException(s"span [${first},${sorted.last.endOffset}) already committed")
          else
            throw new OutOfOrderException(s"overlapping commit at $first < ${seg.confirmedEnd}")
        }
        if (first > seg.confirmedEnd)
          throw new OutOfOrderException(s"gap: commit starts at $first, confirmed end ${seg.confirmedEnd}")
        sorted.sliding(2).foreach {
          case Seq(a0, b0) =>
            if (a0.endOffset != b0.startOffset)
              throw new OutOfOrderException(s"gap inside commit: ${a0.endOffset} != ${b0.startOffset}")
          case _ => ()
        }
        s.copy(segments = s.segments.init :+ seg.copy(files = seg.files ++ sorted))

      case ImportSegment(index, start, end, epoch) =>
        // Metadata bootstrap only (migration-in): importing boundaries into
        // a stream that already holds data could contradict committed files.
        require(s.segments.forall(_.files.isEmpty),
          "segment import into a stream with data (metadata bootstrap only)")
        end.foreach(e => require(e >= start, s"import end $e < start $start"))
        val seg = SegmentState(index, start, epoch, end, Vector.empty)
        val next0 = s.segments.lastOption match {
          case Some(last) =>
            // same chain invariants as CREATE_RANGE (range.go:188-240),
            // against the IMPORTED ends instead of confirmed ones
            if (!last.sealed_)
              throw new SealedException(s"segment ${last.index} still open")
            // MONOTONIC index (not +1): the PD deletes empty droppable
            // ranges `[N, N)` (rpc.fbs:408-412), so a snapshot may have
            // index gaps — offsets stay contiguous regardless
            require(index > last.index, s"segment index $index <= ${last.index}")
            require(start == last.sealedEnd.get, s"segment start $start != ${last.sealedEnd.get}")
            if (epoch < last.epoch)
              throw new FencedException(s"import epoch $epoch < previous segment's ${last.epoch}")
            s.copy(segments = s.segments :+ seg)
          case None =>
            // the FIRST import fixes the trim point: offsets below the
            // source's first range start were trimmed at the source
            require(start >= s.startOffset, s"import start $start < trim ${s.startOffset}")
            s.copy(startOffset = start, segments = Vector(seg))
        }
        // the stream epoch follows its ranges' epochs, like the PD's view
        next0.copy(epoch = math.max(next0.epoch, epoch))

      case BackfillFiles(index, epoch, files) =>
        if (epoch < s.epoch) throw new FencedException(s"backfill epoch $epoch < stream epoch ${s.epoch}")
        val i = s.segments.indexWhere(_.index == index)
        require(i >= 0, s"no segment $index")
        val seg = s.segments(i)
        require(files.nonEmpty, "empty backfill")
        val sorted = files.sortBy(_.startOffset)
        val first = sorted.head.startOffset
        if (first < seg.confirmedEnd) {
          if (sorted.last.endOffset <= seg.confirmedEnd)
            throw new CommittedException(s"span [$first,${sorted.last.endOffset}) already backfilled")
          else
            throw new OutOfOrderException(s"overlapping backfill at $first < ${seg.confirmedEnd}")
        }
        if (first > seg.confirmedEnd)
          throw new OutOfOrderException(s"gap: backfill starts at $first, confirmed end ${seg.confirmedEnd}")
        sorted.sliding(2).foreach {
          case Seq(a0, b0) =>
            if (a0.endOffset != b0.startOffset)
              throw new OutOfOrderException(s"gap inside backfill: ${a0.endOffset} != ${b0.startOffset}")
          case _ => ()
        }
        seg.sealedEnd.foreach { e =>
          require(sorted.last.endOffset <= e,
            s"backfill past sealed end: ${sorted.last.endOffset} > $e")
        }
        s.copy(segments = s.segments.updated(i, seg.copy(files = seg.files ++ sorted)))

      case SealSegment(index, end, epoch) =>
        if (epoch < s.epoch) throw new FencedException(s"seal epoch $epoch < stream epoch ${s.epoch}")
        val i = s.segments.indexWhere(_.index == index)
        require(i >= 0, s"no segment $index")
        val seg = s.segments(i)
        seg.sealedEnd match {
          case Some(e) =>
            // Seal idempotence (replication_range.rs:313-316): same end, no-op.
            require(e == end, s"reseal with different end: $end != $e")
            s
          case None =>
            require(end == seg.confirmedEnd, s"seal end $end != confirmed ${seg.confirmedEnd}")
            s.copy(segments = s.segments.updated(i, seg.copy(sealedEnd = Some(end))))
        }

      case Trim(minOffset) =>
        // TRIM_STREAM (rpc.fbs:572-591): advance start, drop fully-covered
        // files; a straddling file stays (readers re-filter on base_offset).
        // Clamped at nextOffset — trimming "past the end" empties the stream
        // but can never invent unwritten offsets.
        require(minOffset >= s.startOffset, s"trim $minOffset < ${s.startOffset}")
        val eff = math.min(minOffset, s.nextOffset)
        val segs = s.segments
          .map { seg =>
            val kept = seg.files.filter(_.endOffset > eff)
            // An open segment derives its confirm offset from its files
            // (reference ranges track it separately, range/mod.rs:9-42): if
            // the trim vacuums its file prefix, advance `start` to the kept
            // boundary so the derived confirmedEnd — and with it nextOffset —
            // can never regress below already-assigned offsets.
            val start =
              if (seg.sealed_) seg.start
              else math.max(seg.start,
                kept.headOption.map(f => math.min(eff, f.startOffset))
                  .getOrElse(seg.confirmedEnd))
            seg.copy(start = start, files = kept)
          }
          .filter(seg => seg.sealedEnd.forall(_ > eff) || seg.files.nonEmpty || !seg.sealed_)
        s.copy(startOffset = math.max(s.startOffset, eff), segments = segs)

      case ReplaceFiles(index, removed, added) =>
        val i = s.segments.indexWhere(_.index == index)
        require(i >= 0, s"no segment $index")
        val seg = s.segments(i)
        require(seg.sealed_, s"compaction only on sealed segments (segment $index open)")
        val removedSet = removed.toSet
        val old = seg.files.filter(f => removedSet.contains(f.path))
        require(old.size == removedSet.size,
          s"replace references missing files: ${removedSet -- old.map(_.path)}")
        require(old.nonEmpty && added.nonEmpty, "empty replace")
        // The swap must cover exactly the same offset span, gap-free — the
        // same window rule a commit obeys (window.rs:79-204).
        val span = (old.map(_.startOffset).min, old.map(_.endOffset).max)
        val sortedAdd = added.sortBy(_.startOffset)
        require(sortedAdd.head.startOffset == span._1 && sortedAdd.last.endOffset == span._2,
          s"replace span ${(sortedAdd.head.startOffset, sortedAdd.last.endOffset)} != $span")
        sortedAdd.sliding(2).foreach {
          case Seq(a0, b0) => require(a0.endOffset == b0.startOffset,
            s"gap inside replacement: ${a0.endOffset} != ${b0.startOffset}")
          case _ => ()
        }
        // Removed files must be contiguous in the chain (no partial holes).
        val kept = seg.files.filterNot(f => removedSet.contains(f.path))
        require(kept.forall(f => f.endOffset <= span._1 || f.startOffset >= span._2),
          "removed files are not a contiguous run")
        val files = (kept ++ sortedAdd).sortBy(_.startOffset).toVector
        s.copy(segments = s.segments.updated(i, seg.copy(files = files)))

      case UpdateStream(replica, ack, retention) =>
        s.copy(replica = replica.getOrElse(s.replica),
               ackCount = ack.getOrElse(s.ackCount),
               retentionMs = retention.getOrElse(s.retentionMs))

      case DeleteStream() => s.copy(deleted = true)
      case KvPut(k, v)    => s.copy(kv = s.kv + (k -> v))
      case KvDel(k)       => s.copy(kv = s.kv - k)
      case KvDelRange(from, until) =>
        s.copy(kv = s.kv.filter { case (k, _) => k < from || until.exists(k >= _) })
    }
    next.copy(version = version)
  }
}
