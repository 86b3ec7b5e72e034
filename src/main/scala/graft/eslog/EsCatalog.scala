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
  def allocateId(): Long = {
    var id = -1L
    MetaLog.commitWithRetry(root) { st =>
      id = st.kv.get(IdKey).map(_.toLong).getOrElse(0L)
      Seq(KvPut(IdKey, (id + 1).toString))
    }
    id
  }

  def streamDir(name: String): String = MetaLog.join(MetaLog.join(root, "streams"), name)

  /** Allocate an id, reserve the name, create the stream. The reservation is
    * a CAS on the registry BEFORE any filesystem work, so concurrent creators
    * race on one atomic commit: the loser fails cleanly with no orphaned
    * stream directory. (A crash between reserve and create leaves a
    * registered name whose dir is created on first use of EsLog.create —
    * never a dangling unregistered dir.) */
  def createStream(name: String, replica: Int = 1, ackCount: Int = 1,
                   retentionMs: Long = -1L): Long = {
    val id = allocateId()
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
                           retentionMs: Long = -1L): (Long, Boolean) =
    getStream(name) match {
      case Some(id) => (id, false)
      case None =>
        try (createStream(name, replica, ackCount, retentionMs), true)
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
