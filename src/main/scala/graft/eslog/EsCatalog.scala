package graft.eslog

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.meta._

/** The PD-equivalent catalog: a root directory whose own metadata log holds
  * the id allocator and the stream registry (the reference keeps these in
  * etcd under pd/pkg/server/storage/endpoint; here they are KV entries in a
  * CAS-committed log, so every operation below is linearizable without a
  * coordinator).
  *
  *  - [[allocateId]]      = ALLOCATE_ID (pd/pkg/server/id/): CAS counter.
  *  - [[createStream]]    = CREATE_STREAM with allocated id + registration
  *                          (pd/pkg/server/cluster/stream.go:28-56).
  *  - [[listStreams]]     = LIST_RESOURCE over streams (rpc.fbs:691-778).
  *  - [[dropStream]]      = DELETE_STREAM + deregistration.
  */
final class EsCatalog(val root: String) {
  new org.apache.hadoop.fs.Path(root).getFileSystem(
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration()))
    .mkdirs(new org.apache.hadoop.fs.Path(root))
  if (!MetaLog.exists(root))
    try MetaLog.commit(root, StreamState.empty, Seq(CreateStream(-2L, 1, 1, -1L)))
    catch { case _: ConcurrentCommitException => () } // another creator won; fine

  private val IdKey = "id.next"
  private def streamKey(name: String) = s"stream.$name"

  /** Monotonic unique id via CAS increment on the catalog log. */
  def allocateId(): Long = allocateIds(1)

  /** Contiguous id BLOCK in one CAS — the batch-import shape (one commit
    * allocates n ids instead of n commits racing the counter; the PD's id
    * allocator hands out ranges the same way). Returns the first id;
    * `[first, first + n)` belongs to the caller. */
  def allocateIds(n: Int): Long = {
    require(n >= 1, s"need n >= 1 ids, got $n")
    var first = -1L
    MetaLog.commitWithRetry(root) { st =>
      first = st.kv.get(IdKey).map(_.toLong).getOrElse(0L)
      Seq(KvPut(IdKey, (first + n).toString))
    }
    first
  }

  def streamDir(name: String): String = MetaLog.join(MetaLog.join(root, "streams"), name)

  /** Allocate an id, reserve the name, create the stream. The reservation is
    * a CAS on the registry BEFORE any filesystem work, so concurrent creators
    * race on one atomic commit: the loser fails cleanly with no orphaned
    * stream directory. (A crash between reserve and create leaves a
    * registered name whose dir is created on first use of EsLog.create —
    * never a dangling unregistered dir.) */
  def createStream(name: String, replica: Int = 1, ackCount: Int = 1,
                   retentionMs: Long = -1L): Long =
    createStreamWith(allocateId(), name, replica, ackCount, retentionMs)

  /** [[createStream]] with a caller-owned id from [[allocateIds]]. */
  private def createStreamWith(id: Long, name: String, replica: Int,
                               ackCount: Int, retentionMs: Long): Long = {
    var reserved = false
    MetaLog.commitWithRetry(root) { st =>
      reserved = !st.kv.contains(streamKey(name))
      if (reserved) Seq(KvPut(streamKey(name), id.toString)) else Seq.empty
    }
    require(reserved, s"stream '$name' already exists")
    // name reuse after a drop: the old stream's tombstoned log dir would
    // make create lose its version-0 CAS forever — purge it (only the
    // reservation winner reaches this line, so no second creator races us;
    // purgeDeleted refuses non-deleted logs, so a live stream is never hit)
    EsLog.purgeDeleted(streamDir(name))
    EsLog.create(streamDir(name), id, replica, ackCount, retentionMs)
    id
  }

  def getStream(name: String): Option[Long] =
    MetaLog.load(root).kv.get(streamKey(name)).map(_.toLong)

  /** CREATE-IF-ABSENT twin of [[createStream]] — the SQL DDL surface calls
    * this (a statement's analysis may resolve more than once, so the SQL
    * path must be idempotent, like `CREATE TABLE IF NOT EXISTS`). Returns
    * (id, created); a lost creation race resolves to the winner's id. */
  def createStreamIfAbsent(name: String, replica: Int = 1, ackCount: Int = 1,
                           retentionMs: Long = -1L,
                           withId: Option[Long] = None): (Long, Boolean) =
    getStream(name) match {
      case Some(id) => (id, false)
      case None =>
        try (createStreamWith(withId.getOrElse(allocateId()), name, replica,
          ackCount, retentionMs), true)
        catch {
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains("already exists") =>
            (getStream(name).getOrElse(
              throw new IllegalStateException(s"stream '$name' vanished mid-create")), false)
        }
    }

  /** Idempotent drop for the SQL DDL surface: true when THIS call dropped. */
  def dropStreamIfExists(name: String): Boolean =
    getStream(name) match {
      case Some(_) => dropStream(name); true
      case None    => false
    }

  def dropStream(name: String): Unit = {
    EsLog.delete(streamDir(name))
    MetaLog.commitWithRetry(root) { st =>
      if (st.kv.contains(streamKey(name))) Seq(KvDel(streamKey(name))) else Seq.empty
    }
  }

  /** Registered stream names, sorted — ONE registry log read (the SQL
    * catalog plugin's `SHOW TABLES` surface, [[graft.sql.EsCatalogPlugin]]). */
  def streamNames(): Seq[String] = registered()

  /** Registered stream names, sorted. */
  private def registered(): Seq[String] =
    MetaLog.load(root).kv.keys.filter(_.startsWith("stream."))
      .map(_.stripPrefix("stream.")).toSeq.sorted

  /** Load per-stream states with bounded concurrency — ONE pass, each
    * stream's log read exactly once. The PD equivalent serves a stream LIST
    * from a single etcd range scan
    * (pd/pkg/server/storage/endpoint/stream.go:21-24); here the states are
    * independent CAS logs, so the range scan becomes a parallel sweep:
    * wall-clock is max(load), not sum(load) — at 10k registered streams the
    * difference between one metadata round trip and 10k serial ones. */
  private def loadStates(names: Seq[String]): Seq[(String, StreamState)] = {
    if (names.isEmpty) return Seq.empty
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val threads = math.min(32, names.size)
    // CHUNKED fan-out, one task per slice of ~N/(4*threads) names: a
    // fast local log loads in tens of microseconds, so task-per-stream
    // scheduling overhead would exceed the IO itself (measured at 10^4
    // streams in EsCatalogScaleSpec — per-stream futures ran no faster than
    // the serial sweep). Slices amortize that overhead while keeping 4
    // tasks per thread for balance; a slow object-store log (ms per load)
    // still overlaps across the full pool.
    val slice = math.max(1, names.size / (threads * 4))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(
      Future.traverse(names.grouped(slice).toSeq)(c =>
        Future(c.map(n => n -> MetaLog.load(streamDir(n))))),
      5.minutes).flatten
    finally pool.shutdown()
  }

  /** Scan across every registered stream as ONE relation — multi-stream
    * queries in one DataFrame (each row carries its stream_id). All streams'
    * manifests feed a single combined FileIndex, so the plan has one scan
    * node whether the catalog holds 7 streams or 10⁴ (measured in
    * EsCatalogScaleSpec); per-stream pruning survives because every manifest
    * entry keeps its stream id and offset/timestamp stats
    * ([[EsLog.scanStates]]). States load once, in one bounded-parallel pass. */
  def scanAll(spark: SparkSession): DataFrame =
    EsLog.scanStates(spark, root,
      loadStates(registered()).map { case (n, st) => (streamDir(n), st) })

  /** Live (name, state) pairs in one bounded-parallel pass — the building
    * block of [[scanAll]] and the catalog streaming source. */
  private[graft] def namedStates(): Seq[(String, StreamState)] =
    loadStates(registered())

  /** Registry-level WATCH_RESOURCE: streams appearing/disappearing as a
    * STREAMING change feed — `put(name, stream_id)` / `del(name)` rows with
    * `revision` = the catalog log version. List-then-watch has no gap:
    * revisions are the same monotonic counter [[registryHistory]] and the
    * registry log share. (The reference's PD resource watch over etcd,
    * rpc.fbs:691-778; [[graft.sources.EsLogRegistryWatchSource]].) */
  def watchRegistry(spark: SparkSession): DataFrame =
    spark.readStream.format("eslog").option("watch", "registry").load(root)

  /** Batch twin of [[watchRegistry]]: the full registry event history (same
    * schema, same extraction — a catch-up read before switching to the
    * stream). */
  def registryHistory(spark: SparkSession): DataFrame = {
    import graft.sources.EsLogRegistryWatchSource
    spark.createDataFrame(
      EsLogRegistryWatchSource.events(root, -1L, MetaLog.latestVersion(root)).asJava,
      EsLogRegistryWatchSource.schema)
  }

  /** LIST_RESOURCE: registered streams with their live metadata (states
    * loaded in one parallel pass, see [[loadStates]]). */
  def listStreams(spark: SparkSession): DataFrame = {
    val ids = MetaLog.load(root).kv
    spark.createDataFrame(
      pageRows(ids, loadStates(registered())).asJava, ListSchema)
  }

  /** Catalog-wide consumer-group lag — the `--all-groups` admin sweep over
    * every registered stream: one row `(stream, grp, committed, position,
    * next_offset, lag)` per (stream, committed group), name-ordered. Each
    * stream's position and head come from its ONE state load (the
    * [[loadStates]] parallel sweep — never a torn per-value read); with
    * `group` given, every stream reports that group (uncommitted =>
    * `committed=false`, lag = the whole backlog). Deleted streams are
    * skipped. */
  def groupLags(spark: SparkSession, group: Option[String] = None): DataFrame = {
    val rows = loadStates(registered()).sortBy(_._1)
      .filterNot(_._2.deleted)
      .flatMap { case (name, st) =>
        val groups: Seq[(String, Option[Long])] = group match {
          case Some(g) =>
            Seq(g -> st.kv.get(EsLog.GroupKeyPrefix + g).map(_.toLong))
          case None => st.kv.toSeq.collect {
            case (k, v) if k.startsWith(EsLog.GroupKeyPrefix) =>
              k.stripPrefix(EsLog.GroupKeyPrefix) -> Some(v.toLong)
          }.sortBy(_._1)
        }
        groups.map { case (g, p) =>
          val pos = p.getOrElse(st.startOffset)
          Row(name, g, p.isDefined, pos, st.nextOffset, st.nextOffset - pos)
        }
      }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("stream", StringType, nullable = false),
      StructField("grp", StringType, nullable = false),
      StructField("committed", BooleanType, nullable = false),
      StructField("position", LongType, nullable = false),
      StructField("next_offset", LongType, nullable = false),
      StructField("lag", LongType, nullable = false))))
  }

  /** Catalog-wide fan-out intent sweep — "every in-flight fan-out intent
    * under this root", the stuck-pipeline twin of [[groupLags]]:
    * [[EsLog.fanOutIntent]] answers one (stream, group); operators watching
    * a fleet want the full list next to the lag table (a long-lived intent
    * = a crashed or fenced run holds that group's next span; any live-epoch
    * instance can adopt and complete it by re-running the job). One row
    * `(stream, grp, intent_from, intent_up_to, position, next_offset)` per
    * in-flight intent, name-ordered. Same scale shape as [[groupLags]]:
    * each stream contributes ONE state load from the bounded-parallel
    * [[loadStates]] sweep (never a torn per-value read); streams with no
    * intent contribute no row; deleted streams are skipped. */
  def fanOutIntents(spark: SparkSession): DataFrame = {
    val rows = loadStates(registered()).sortBy(_._1)
      .filterNot(_._2.deleted)
      .flatMap { case (name, st) =>
        st.kv.toSeq.collect {
          case (k, v) if k.startsWith(EsLog.FanOutIntentPrefix) =>
            val g = k.stripPrefix(EsLog.FanOutIntentPrefix)
            val Array(f, u) = v.split(":", 2)
            val pos = st.kv.get(EsLog.GroupKeyPrefix + g).map(_.toLong)
              .getOrElse(st.startOffset)
            Row(name, g, f.toLong, u.toLong, pos, st.nextOffset)
        }.sortBy(_.getString(1))
      }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("stream", StringType, nullable = false),
      StructField("grp", StringType, nullable = false),
      StructField("intent_from", LongType, nullable = false),
      StructField("intent_up_to", LongType, nullable = false),
      StructField("position", LongType, nullable = false),
      StructField("next_offset", LongType, nullable = false))))
  }

  /** Paginated LIST_RESOURCE (the reference's ListResourceRequest carries a
    * limit and an opaque continuation token, rpc.fbs:691-778 — PD pages its
    * etcd range scan). The token is the last name of the previous page
    * (exclusive resume point); `None` back means the listing is complete.
    *
    * Scale: a page loads ONLY its own streams' states — a 10⁴-stream
    * registry serves a 100-row page with 100 state loads, not 10⁴ (the
    * registry NAME list itself is one O(1) checkpointed log read). Pages
    * run against the live registry, like the reference's: a stream created
    * before the cursor or dropped after it may be missed/seen — callers
    * needing a gap-free view compose list with [[watchRegistry]] revisions,
    * exactly the etcd list-then-watch pattern. */
  def listStreamsPage(spark: SparkSession, limit: Int,
                      continueFrom: Option[String] = None): (DataFrame, Option[String]) = {
    require(limit >= 1, s"limit must be >= 1, got $limit")
    val ids = MetaLog.load(root).kv // ONE registry load serves names and ids
    val all = ids.keys.filter(_.startsWith("stream.")).map(_.stripPrefix("stream."))
      .toSeq.sorted.filter(n => continueFrom.forall(_ < n))
    val page = all.take(limit)
    val next = if (all.size > limit) Some(page.last) else None
    (spark.createDataFrame(pageRows(ids, loadStates(page)).asJava, ListSchema), next)
  }

  // ---- batch admin ----
  // The reference's create/delete stream frames are documented as batch
  // RPCs ("this frame with batch ability is very useful for importing
  // metadata from other systems", rpc.fbs:494-496) and every response
  // carries a per-stream Status (rpc.fbs:504-533). Same contract here:
  // each stream is ONE independent CAS — no cross-stream transaction, like
  // the PD where each create is its own etcd txn — and partial failure is
  // REPORTED per stream (status column), never thrown, so a 10k-stream
  // metadata import survives the duplicates instead of dying at the first.
  // Work fans out through the same bounded pool as [[loadStates]]: the
  // registry CAS is the serialization point (contenders retry), the
  // per-stream filesystem work overlaps.

  private def batched[A, B](items: Seq[A])(f: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    val threads = math.min(16, items.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try Await.result(Future.traverse(items)(a => Future(f(a))), 10.minutes)
    finally pool.shutdown()
  }

  private val AdminSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("stream_id", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  /** Batch CREATE_STREAM: one row `(name, stream_id, status)` per spec, in
    * spec order — status `OK` (created by this call) or `ALREADY_EXISTS`
    * (the id reported is the existing stream's). Duplicate names WITHIN the
    * batch race like concurrent creators: exactly one wins OK. */
  def createStreams(spark: SparkSession, specs: Seq[EsCatalog.StreamSpec]): DataFrame = {
    if (specs.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), AdminSchema)
    // ONE CAS allocates the whole batch's ids in spec order — deterministic
    // ids under the parallel fan-out, and 1 + n commits instead of 2n.
    val firstId = allocateIds(specs.size)
    val rows = batched(specs.zipWithIndex) { case (sp, i) =>
      val (id, created) = createStreamIfAbsent(sp.name, sp.replica, sp.ackCount,
        sp.retentionMs, withId = Some(firstId + i))
      Row(sp.name, id, if (created) "OK" else "ALREADY_EXISTS")
    }
    spark.createDataFrame(rows.asJava, AdminSchema)
  }

  /** Batch DELETE_STREAM: `(name, stream_id, status)` per name, status `OK`
    * or `NOT_FOUND` (id -1 then — the response omits the stream when "the
    * stream is not deleted", rpc.fbs:526-529). */
  def deleteStreams(spark: SparkSession, names: Seq[String]): DataFrame = {
    val rows = batched(names) { n =>
      getStream(n) match {
        case Some(id) => dropStream(n); Row(n, id, "OK")
        case None     => Row(n, -1L, "NOT_FOUND")
      }
    }
    spark.createDataFrame(rows.asJava, AdminSchema)
  }

  /** Batch DESCRIBE_STREAM: live metadata per name; unknown names report
    * `NOT_FOUND` with zeroed fields instead of failing the batch. */
  def describeStreams(spark: SparkSession, names: Seq[String]): DataFrame = {
    val rows = batched(names) { n =>
      getStream(n) match {
        case Some(id) =>
          val st = MetaLog.load(streamDir(n))
          Row(n, id, st.epoch, st.startOffset, st.nextOffset, st.deleted, "OK")
        case None => Row(n, -1L, 0L, 0L, 0L, false, "NOT_FOUND")
      }
    }
    spark.createDataFrame(rows.asJava, StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("stream_id", LongType, nullable = false),
      StructField("epoch", LongType, nullable = false),
      StructField("start_offset", LongType, nullable = false),
      StructField("next_offset", LongType, nullable = false),
      StructField("deleted", BooleanType, nullable = false),
      StructField("status", StringType, nullable = false))))
  }

  // ---- PD metadata snapshot: migration-in (and its export twin) ----

  /** Ingest a PD etcd metadata snapshot — the METADATA half of migration-in.
    *
    * `kv` carries the dump as `(key, value)` rows (key string or binary,
    * value binary — the shape any etcd export tool emits). Recognized keys
    * ([[graft.model.PdSnapshot]]): stream records under `streams/<id>`
    * (FlatBuffers `Stream`, endpoint/stream.go:17-24), range records under
    * `s/<id>/ranges/<idx>` (FlatBuffers `Range`, endpoint/range.go:20-33).
    * The by-server index keys (`rs/...`, nil values) and any other PD keys
    * (cluster id, server registrations, leases) are IGNORED — they describe
    * the source cluster's topology, which has no analogue here.
    *
    * Per stream: a catalog entry `<namePrefix><id>` is created PRESERVING
    * the PD stream id, replica/ack/retention config rides along, and the
    * range records replay as [[graft.meta.ImportSegment]] actions — epochs,
    * boundaries, trim (= first range's start, the PD's trim semantics) and
    * next offset (= last range's sealed end) all land exactly as the source
    * deployment declared them. The catalog's id allocator is bumped past
    * the largest ingested id so future creations can never collide. Data
    * then arrives through [[EsLog.backfillObjectDir]]/[[EsLog
    * .backfillWalDir]] at its ORIGINAL offsets, under this metadata.
    *
    * The dump is metadata-scale (streams + ranges, not data) and is
    * collected to the driver under the house fail-fast knob `maxEntries`.
    *
    * @return one row per ingested stream `(name, stream_id, replica,
    *         ack_count, retention_ms, epoch, start_offset, next_offset,
    *         n_ranges, status)` — status `OK`, `ALREADY_EXISTS` (idempotent
    *         re-ingest: stream + segments already present), or
    *         `ORPHAN_RANGES` (ranges with no stream record: nothing
    *         created, reported loudly). Name-ordered. */
  def ingestPdSnapshot(spark: SparkSession, kv: DataFrame,
                       rootPath: String = "", namePrefix: String = "pd-",
                       maxEntries: Long = 1000000L): DataFrame = {
    import graft.model.PdSnapshot
    import graft.model.PdSnapshot.{PdKey, PdRange, PdStream}
    import org.apache.spark.sql.functions.col
    val prefix = if (rootPath.isEmpty) "" else rootPath.stripSuffix("/") + "/"
    // prefer NAMED key/value columns (any case) over positional order — an
    // etcd export with (value, key) column order must not silently swap
    def named(n: String, fallback: Int): String =
      kv.columns.find(_.equalsIgnoreCase(n)).getOrElse(kv.columns(fallback))
    // ONE job: collect maxEntries+1 rows and check the size, instead of a
    // separate count() pass over the dump source
    val raw = kv.select(col(named("key", 0)).cast("string").as("k"),
        col(named("value", 1)).cast("binary").as("v"))
      .limit(math.toIntExact(math.min(maxEntries + 1, Int.MaxValue.toLong)))
      .collect()
    if (raw.length > maxEntries) throw new IllegalArgumentException(
      s"ingestPdSnapshot: more than maxEntries=$maxEntries etcd entries — " +
        "the metadata snapshot collects to the driver (streams + ranges " +
        "are metadata-scale); raise maxEntries if the driver can hold it, " +
        "or pre-filter the dump to the streams/ and s/ keyspaces")
    val entries = raw.iterator.flatMap { r =>
      val key = r.getString(0)
      if (key == null) None
      else if (prefix.nonEmpty && !key.startsWith(prefix)) None
      else Some((PdSnapshot.parseKey(key.stripPrefix(prefix)), r.getAs[Array[Byte]](1)))
    }.toSeq
    // decode per VALUE with isolation: one bit-flipped record must fail its
    // own stream's status row, never the other 10k streams of the import
    val streams = scala.collection.mutable.Map.empty[Long, PdStream]
    val rangesRaw = scala.collection.mutable.ArrayBuffer.empty[(Long, PdRange)]
    val decodeErr = scala.collection.mutable.Map.empty[Long, String]
    entries.foreach {
      case (PdKey.Stream(id), v) if v != null && v.nonEmpty =>
        try streams(id) = PdSnapshot.decodeStream(v)
        catch { case scala.util.control.NonFatal(e) =>
          decodeErr.getOrElseUpdate(id, s"ERROR: undecodable stream record: ${e.getMessage}") }
      case (PdKey.Range(sid, idx), v) if v != null && v.nonEmpty =>
        try rangesRaw += sid -> PdSnapshot.decodeRange(v)
        catch { case scala.util.control.NonFatal(e) =>
          decodeErr.getOrElseUpdate(sid, s"ERROR: undecodable range record $idx: ${e.getMessage}") }
      case _ => () // rs/ index keys, foreign keys, nil values
    }
    val rangesByStream: Map[Long, Seq[PdRange]] =
      rangesRaw.groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_.index)).toMap

    // bump the id allocator past every ingested id, ONE CAS
    val maxId = (streams.keys ++ rangesByStream.keys).foldLeft(-1L)(math.max)
    if (maxId >= 0) MetaLog.commitWithRetry(root) { st =>
      val cur = st.kv.get(IdKey).map(_.toLong).getOrElse(0L)
      if (cur <= maxId) Seq(KvPut(IdKey, (maxId + 1).toString)) else Seq.empty
    }

    // per-stream status isolation (the batch-admin house contract,
    // rpc.fbs:504-533): one stream's malformed ranges must not fail the
    // other 10k streams of the import. The segment import itself is ONE
    // commit per stream — all ranges land or none do. Work fans out through
    // the same bounded pool as the batch admin surface (the registry CAS is
    // the serialization point; per-stream log IO overlaps).
    val rows = batched(streams.toSeq.sortBy(_._1)) { case (id, ps) =>
      val name = s"$namePrefix$id"
      val ranges = rangesByStream.getOrElse(id, Seq.empty)
      val dir = streamDir(name)
      val status = decodeErr.get(id).getOrElse {
        try {
          val (gotId, created) = createStreamIfAbsent(name, math.max(ps.replica, 1),
            math.max(ps.ackCount, 1), ps.retentionMs, withId = Some(id))
          if (gotId != id)
            s"ERROR: name '$name' already maps to stream $gotId, dump says $id"
          else {
            // resume-safe: a crash between the registry CAS and the segment
            // commit (or a metadata-only pre-existing stream) must not skip
            // the boundary import forever — import whenever the stream still
            // has no segments; the in-commit guard makes racing twins safe
            val imported =
              if (ranges.isEmpty) false
              else {
                var did = false
                MetaLog.commitWithRetry(dir) { st =>
                  if (st.segments.nonEmpty) { did = false; Seq.empty }
                  else {
                    did = true
                    ranges.map(r => ImportSegment(r.index, r.start,
                      if (r.end >= 0) Some(r.end) else None, math.max(r.epoch, 0L)))
                  }
                }
                did
              }
            if (created || imported) "OK" else "ALREADY_EXISTS"
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            s"ERROR: ${Option(e.getMessage).getOrElse(e.getClass.getName)}"
        }
      }
      val st = if (MetaLog.exists(dir)) MetaLog.load(dir) else StreamState.empty
      Row(name, id, ps.replica, ps.ackCount, ps.retentionMs, st.epoch,
        st.startOffset, st.nextOffset, ranges.size.toLong, status)
    }
    val others = (rangesByStream.keySet ++ decodeErr.keySet -- streams.keySet)
      .toSeq.sorted.map { id =>
        Row(s"$namePrefix$id", id, 0, 0, 0L, 0L, 0L, 0L,
          rangesByStream.get(id).map(_.size.toLong).getOrElse(0L),
          decodeErr.getOrElse(id, "ORPHAN_RANGES"))
      }
    spark.createDataFrame((rows ++ others).sortBy(_.getString(0)).asJava, PdIngestSchema)
  }

  /** Export this catalog's metadata AS a PD etcd snapshot — the migration-
    * OUT twin of [[ingestPdSnapshot]]: every registered stream renders to
    * its `streams/<id>` record and `s/<id>/ranges/<idx>` range records in
    * the PD's exact key/value layout ([[graft.model.PdSnapshot
    * .renderStream]]), so a reference deployment (or another graft catalog)
    * can adopt this catalog's streams. Round-trips through
    * [[ingestPdSnapshot]] losslessly (PdSnapshotSpec pins it).
    *
    * Range records carry NO `RangeServer` entries and therefore no `rs/`
    * by-server index keys: this architecture has no range servers (object
    * storage replaces them), so there is no server topology to export — an
    * adopting PD assigns its own placement, as it does for ranges whose
    * servers decommissioned. */
  def exportPdSnapshot(spark: SparkSession): DataFrame = {
    import graft.model.PdSnapshot
    import graft.model.PdSnapshot.{PdRange, PdStream}
    val kvs = namedStates().sortBy(_._2.streamId).filterNot(_._2.deleted)
      .flatMap { case (_, st) =>
        val ps = PdStream(st.streamId, st.replica, st.ackCount, st.retentionMs)
        val ranges = st.segments.map { seg =>
          PdRange(st.streamId, seg.epoch, seg.index, seg.start,
            seg.sealedEnd.getOrElse(-1L), Seq.empty)
        }
        PdSnapshot.renderStream(ps, ranges)
      }
    spark.createDataFrame(
      kvs.map { case (k, v) => Row(k, v) }.asJava,
      StructType(Seq(StructField("key", StringType, nullable = false),
        StructField("value", BinaryType, nullable = false))))
  }

  private val PdIngestSchema = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("stream_id", LongType, nullable = false),
    StructField("replica", IntegerType, nullable = false),
    StructField("ack_count", IntegerType, nullable = false),
    StructField("retention_ms", LongType, nullable = false),
    StructField("epoch", LongType, nullable = false),
    StructField("start_offset", LongType, nullable = false),
    StructField("next_offset", LongType, nullable = false),
    StructField("n_ranges", LongType, nullable = false),
    StructField("status", StringType, nullable = false)))

  private val ListSchema = StructType(Seq(
    StructField("name", StringType), StructField("stream_id", LongType),
    StructField("epoch", LongType), StructField("start_offset", LongType),
    StructField("next_offset", LongType), StructField("deleted", BooleanType)))

  private def pageRows(ids: Map[String, String],
                       states: Seq[(String, StreamState)]): Seq[Row] =
    states.map { case (name, st) =>
      Row(name, ids(s"stream.$name").toLong, st.epoch, st.startOffset,
        st.nextOffset, st.deleted)
    }
}

object EsCatalog {
  /** One stream to create — the reference's `Stream` table (rpc.fbs:479-492)
    * plus the name the registry keys on. */
  final case class StreamSpec(name: String, replica: Int = 1, ackCount: Int = 1,
                              retentionMs: Long = -1L)
}
