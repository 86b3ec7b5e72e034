package graft.meta

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import com.fasterxml.jackson.databind.{ObjectMapper, JsonNode}
import com.fasterxml.jackson.databind.node.{ObjectNode, ArrayNode}

/** The per-stream metadata log: `<streamDir>/_eslog/<version%020d>.json`.
  *
  * Each version file holds a JSON array of actions committed atomically.
  * Commit is compare-and-swap: the version number IS the CAS token — writing
  * version N succeeds for exactly one writer (hard-link creation is atomic and
  * fails if the target exists). This replaces the reference's etcd
  * transactions (pd/pkg/server/storage/endpoint) and, combined with epoch
  * fencing in [[StreamState]], gives the single-writer guarantee the
  * reference gets from the seal protocol.
  *
  * Designed for object-store translation: on S3 the hard-link trick becomes a
  * conditional PUT (If-None-Match) on the same layout; nothing else changes.
  * The log stays O(segments); [[checkpoint]] compacts it so a 100 TB stream
  * with ~100k files still loads in one read.
  */
object MetaLog {
  private val mapper = new ObjectMapper()
  val LogDirName = "_eslog"

  def logDir(streamDir: String): Path = Paths.get(streamDir, LogDirName)

  private def versionFile(streamDir: String, v: Long): Path =
    logDir(streamDir).resolve(f"$v%020d.json")

  // ---- JSON codec (hand-rolled over Jackson nodes: stable, no reflection) ----

  private def fileToJson(f: FileMeta): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("path", f.path); o.put("rows", f.rows); o.put("bytes", f.bytes)
    o.put("startOffset", f.startOffset); o.put("endOffset", f.endOffset)
    o.put("minTimestamp", f.minTimestamp); o.put("maxTimestamp", f.maxTimestamp)
    o
  }

  private def fileFromJson(n: JsonNode): FileMeta = FileMeta(
    n.get("path").asText(), n.get("rows").asLong(), n.get("bytes").asLong(),
    n.get("startOffset").asLong(), n.get("endOffset").asLong(),
    n.get("minTimestamp").asLong(), n.get("maxTimestamp").asLong())

  def actionToJson(a: Action): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("action", a.action)
    a match {
      case CreateStream(id, r, ack, ret) =>
        o.put("streamId", id); o.put("replica", r); o.put("ackCount", ack); o.put("retentionMs", ret)
      case OpenStream(e) => o.put("epoch", e)
      case OpenSegment(i, st, e) => o.put("index", i); o.put("start", st); o.put("epoch", e)
      case CommitFiles(i, e, files) =>
        o.put("index", i); o.put("epoch", e)
        val arr = o.putArray("files"); files.foreach(f => arr.add(fileToJson(f)))
      case SealSegment(i, end, e) => o.put("index", i); o.put("end", end); o.put("epoch", e)
      case Trim(m) => o.put("minOffset", m)
      case UpdateStream(r, ack, ret) =>
        r.foreach(o.put("replica", _)); ack.foreach(o.put("ackCount", _)); ret.foreach(o.put("retentionMs", _))
      case DeleteStream() => ()
      case KvPut(k, v) => o.put("key", k); o.put("value", v)
      case KvDel(k) => o.put("key", k)
    }
    o
  }

  def actionFromJson(n: JsonNode): Action = n.get("action").asText() match {
    case "createStream" => CreateStream(n.get("streamId").asLong(), n.get("replica").asInt(),
      n.get("ackCount").asInt(), n.get("retentionMs").asLong())
    case "openStream" => OpenStream(n.get("epoch").asLong())
    case "openSegment" => OpenSegment(n.get("index").asInt(), n.get("start").asLong(), n.get("epoch").asLong())
    case "commitFiles" =>
      val files = n.get("files").elements().asScala.map(fileFromJson).toSeq
      CommitFiles(n.get("index").asInt(), n.get("epoch").asLong(), files)
    case "sealSegment" => SealSegment(n.get("index").asInt(), n.get("end").asLong(), n.get("epoch").asLong())
    case "trim" => Trim(n.get("minOffset").asLong())
    case "updateStream" => UpdateStream(
      Option(n.get("replica")).map(_.asInt()),
      Option(n.get("ackCount")).map(_.asInt()),
      Option(n.get("retentionMs")).map(_.asLong()))
    case "deleteStream" => DeleteStream()
    case "kvPut" => KvPut(n.get("key").asText(), n.get("value").asText())
    case "kvDel" => KvDel(n.get("key").asText())
    case other => throw new IllegalArgumentException(s"unknown action $other")
  }

  // ---- log IO ----

  def exists(streamDir: String): Boolean = Files.isDirectory(logDir(streamDir))

  private def listVersions(streamDir: String): Seq[Long] = {
    val dir = logDir(streamDir)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("_"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted
  }

  private def readVersion(streamDir: String, v: Long): Seq[Action] = {
    val bytes = Files.readAllBytes(versionFile(streamDir, v))
    val root = mapper.readTree(bytes)
    // A version file may be a checkpoint: {"checkpoint": {...state...}} is
    // handled by load(); plain versions are arrays of actions.
    root.elements().asScala.map(actionFromJson).toSeq
  }

  /** Fold the log into a snapshot-consistent state. */
  def load(streamDir: String): StreamState = {
    val versions = listVersions(streamDir)
    versions.foldLeft(StreamState.empty) { (s, v) =>
      readVersion(streamDir, v).foldLeft(s)((s2, a) => StreamState.apply(s2, a, v))
    }
  }

  /** CAS-append `actions` as version `expectedVersion + 1`.
    * Returns the new state; throws [[ConcurrentCommitException]] if another
    * writer won the version (caller should re-load, re-validate, retry).
    */
  def commit(streamDir: String, state: StreamState, actions: Seq[Action]): StreamState = {
    // Validate locally first so a bad commit never hits the log.
    val v = state.version + 1
    val next = actions.foldLeft(state)((s, a) => StreamState.apply(s, a, v))
    val dir = logDir(streamDir)
    Files.createDirectories(dir)
    val arr: ArrayNode = mapper.createArrayNode()
    actions.foreach(a => arr.add(actionToJson(a)))
    val tmp = Files.createTempFile(dir, s"_tmp-$v-", ".json")
    try {
      Files.write(tmp, mapper.writeValueAsBytes(arr))
      try Files.createLink(versionFile(streamDir, v), tmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(s"version $v already committed in $streamDir")
      }
    } finally Files.deleteIfExists(tmp)
    next
  }

  /** Retry loop for contended commits: re-load, re-derive actions, commit. */
  def commitWithRetry(streamDir: String, maxAttempts: Int = 20)(
      mkActions: StreamState => Seq[Action]): StreamState = {
    var attempt = 0
    while (true) {
      val state = load(streamDir)
      val actions = mkActions(state)
      if (actions.isEmpty) return state
      try return commit(streamDir, state, actions)
      catch {
        case e: ConcurrentCommitException =>
          attempt += 1
          if (attempt >= maxAttempts) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)
