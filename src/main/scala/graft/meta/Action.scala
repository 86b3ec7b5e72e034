package graft.meta

/** Metadata-log actions — the durable state machine of a stream.
  *
  * Delta-style: a stream is a directory; its `_eslog/` subdirectory holds one
  * JSON file per log version, committed with compare-and-swap (hard-link
  * rename, see [[MetaLog]]). Folding the actions yields [[StreamState]].
  *
  * These actions re-express the reference's PD/range state machine as
  * metadata-log invariants:
  *  - CreateStream   = CREATE_STREAM (pd/pkg/server/cluster/stream.go:28-56)
  *  - OpenStream     = open_stream epoch fencing + seal-last-range recovery
  *                     (components/replication/src/stream/replication_stream.rs:241-295)
  *  - OpenSegment    = CREATE_RANGE invariants: index = last+1, start = last.end,
  *                     epoch >= last.epoch (pd/pkg/server/cluster/range.go:188-240)
  *  - CommitFiles    = APPEND commit through the write window: offsets must be
  *                     gap-free and contiguous (range-server/src/range_manager/window.rs:79-204)
  *  - SealSegment    = SEAL_RANGE: fixes the final `end`, idempotent
  *                     (components/model/src/range/mod.rs:129-140, replication_range.rs:313-316)
  *  - Trim           = TRIM_STREAM: advance min offset, drop covered files
  *                     (rpc.fbs:572-591)
  *  - DeleteStream   = DELETE_STREAM (pd/pkg/server/cluster/stream.go:58-77)
  */
sealed trait Action { def action: String }

final case class FileMeta(
    path: String,          // relative to the stream dir
    rows: Long,
    bytes: Long,
    startOffset: Long,     // first logical offset in the file
    endOffset: Long,       // exclusive: last batch's base_offset + delta
    minTimestamp: Long,    // epoch millis, for time-based pruning
    maxTimestamp: Long,
    // Widest batch in the file. Lets fetch rewrite the straddle lower bound
    // `base_offset + last_offset_delta > lo` as the Parquet-pushable
    // `base_offset > lo - maxDelta` (+ exact residual) — the pushdown analogue
    // of the reference's sparse-index position hints (object_reader.rs:68-76).
    maxDelta: Int = 1
)

final case class CreateStream(streamId: Long, replica: Int, ackCount: Int,
                              retentionMs: Long) extends Action {
  val action = "createStream"
}

final case class OpenStream(epoch: Long) extends Action { val action = "openStream" }

final case class OpenSegment(index: Int, start: Long, epoch: Long) extends Action {
  val action = "openSegment"
}

final case class CommitFiles(index: Int, epoch: Long, files: Seq[FileMeta]) extends Action {
  val action = "commitFiles"
}

final case class SealSegment(index: Int, end: Long, epoch: Long) extends Action {
  val action = "sealSegment"
}

final case class Trim(minOffset: Long) extends Action { val action = "trim" }

/** Compaction (the RangeAccumulator file-size policy,
  * components/object-storage/src/range_accumulator.rs:37-98, re-expressed as
  * a metadata swap): `added` must tile exactly the offset span covered by
  * `removed` — same records, fewer/larger immutable files. */
final case class ReplaceFiles(index: Int, removed: Seq[String],
                              added: Seq[FileMeta]) extends Action {
  val action = "replaceFiles"
}

/** Metadata-only segment materialization — the migration-in bootstrap
  * ([[graft.eslog.EsCatalog.ingestPdSnapshot]]): a PD range record
  * (rpc.fbs:392-425, etcd key `s/<streamID>/ranges/<rangeID>`) becomes a
  * segment with EXPLICIT boundaries before any data exists. Unlike
  * [[OpenSegment]]/[[SealSegment]] — which derive ends from committed
  * files — an imported segment carries the SOURCE deployment's sealed end
  * (`end = Some`) or openness (`end = None`); data arrives later through
  * [[BackfillFiles]]. Only legal while the stream holds no data at all
  * (pure-metadata phase), so the import can never contradict files. The
  * first import also fixes the trim point: the source's start offsets are
  * authoritative (PD trim advances the first range's start). */
final case class ImportSegment(index: Int, start: Long, end: Option[Long],
                               epoch: Long) extends Action {
  val action = "importSegment"
}

/** Offset-PRESERVING file attach into an existing (possibly sealed,
  * possibly non-last) segment — the data half of migration-in. The same
  * window-contiguity rules as [[CommitFiles]] (gap-free, attaches exactly
  * at the segment's confirmed end, idempotent retry of a committed span),
  * but anchored at the TARGET segment instead of the open head and bounded
  * by its imported sealed end — so bucket objects and WAL segments land
  * under the metadata boundaries the PD snapshot declared, with their
  * original offsets. */
final case class BackfillFiles(index: Int, epoch: Long,
                               files: Seq[FileMeta]) extends Action {
  val action = "backfillFiles"
}

final case class DeleteStream() extends Action { val action = "deleteStream" }

final case class UpdateStream(replica: Option[Int], ackCount: Option[Int],
                              retentionMs: Option[Long]) extends Action {
  val action = "updateStream"
}

/** KV surface (the PD-hosted etcd-like store, rpc.fbs:780-931, KVClient.java). */
final case class KvPut(key: String, value: String) extends Action { val action = "kvPut" }
final case class KvDel(key: String) extends Action { val action = "kvDel" }

/** Ranged tombstone (etcd DeleteRangeRequest, rpc.fbs:780-931): one action
  * deletes every key in [from, until) — `until = None` means to the end of
  * the keyspace. A range delete over a million-key KV is one log entry, not
  * a million [[KvDel]]s materialized into the commit. */
final case class KvDelRange(from: String, until: Option[String]) extends Action {
  val action = "kvDelRange"
}

/** Guards of a KV transaction (etcd Compare, rpc.fbs:904-931): request
  * shapes, not actions — evaluated against the current state inside the CAS
  * commit, never persisted. */
sealed trait KvGuard {
  def key: String
  def holds(kv: Map[String, String]): Boolean
}
/** Key's current value equals `value`. */
final case class KvValueIs(key: String, value: String) extends KvGuard {
  def holds(kv: Map[String, String]): Boolean = kv.get(key).contains(value)
}
/** Key exists, any value (etcd existence compare). */
final case class KvPresent(key: String) extends KvGuard {
  def holds(kv: Map[String, String]): Boolean = kv.contains(key)
}
/** Key does not exist. */
final case class KvAbsent(key: String) extends KvGuard {
  def holds(kv: Map[String, String]): Boolean = !kv.contains(key)
}

/** Rejections mirror the reference's error codes (rpc.fbs:40-45 + window.rs). */
final class FencedException(msg: String) extends RuntimeException(msg)       // EXPIRED_STREAM_EPOCH
final class OutOfOrderException(msg: String) extends RuntimeException(msg)   // OFFSET_OUT_OF_ORDER
final class CommittedException(msg: String) extends RuntimeException(msg)    // OFFSET_COMMITTED (idempotent retry)
final class SealedException(msg: String) extends RuntimeException(msg)       // RANGE_ALREADY_SEALED
