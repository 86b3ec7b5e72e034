package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.meta.MetaLog

/** MetaLog-style commit pointer for the persisted ANN / media index
  * layouts — the machinery that makes index MAINTENANCE transactional the
  * same way [[graft.meta.MetaLog]] makes stream commits transactional
  * (reference precedent: COMMIT_OBJECT registers finished objects before
  * they become visible, rpc.fbs:676-689; the repo precedent is
  * `MetaLog.commit`'s putIfAbsent CAS on the version number).
  *
  * Layout: `<indexDir>/_index_log/<version%020d>.json`, one file per
  * committed index version, written with [[graft.meta.LogStore.putIfAbsent]]
  * (the version number IS the CAS token — FS: hard link; S3: conditional
  * PUT). Each commit carries the COMPLETE state (the live data-tree names +
  * every applied append batch id), so a reader loads exactly one file — the
  * highest version — and never folds deltas. Data trees are IMMUTABLE once
  * committed: an append writes a NEW tree then commits `dirs + tree`; a
  * compact writes a NEW merged tree then commits `tree + (trees added by
  * rivals since it read)`; nothing ever rewrites or renames a committed
  * tree. Consequences, each pinned in IndexCommitSpec:
  *
  *  - '''reader transparency''': a search resolves the live trees at read
  *    time from one committed version; a concurrent compact/append flips
  *    the pointer but never touches the trees a running search planned
  *    over — no "quiesce searches" window anywhere;
  *  - '''crash safety''': a maintenance job that dies before its CAS
  *    leaves the pointer on the old version and one unreferenced tree —
  *    readers are unaffected and [[vacuum]] reclaims the orphan;
  *  - '''replay safety''': an append that carries a `batchId` is skipped
  *    (and its tree deleted) when that id is already in the committed
  *    state — `foreachBatch` retries and duplicated micro-batch delivery
  *    append exactly once at the INDEX level, not "rebuild-on-doubt".
  *
  * Pre-pointer indexes (no `_index_log/`) keep working: readers fall back
  * to the legacy single-tree name, and the first append/compact bootstraps
  * version 0 around the existing tree.
  *
  * `batch_ids` grow one entry per replay-guarded append for the index
  * lifetime (compaction carries them forward — dropping them would let an
  * old batch replay after a compact). One id per ingest micro-batch keeps
  * the commit file in the tens of KB over years of appends; a rebuild
  * ([[Similarity.writeIvfIndex]] family) resets them.
  */
object IndexCommit {
  private val LogDirName = "_index_log"
  private val mapper = new ObjectMapper()

  /** One committed index version: the live data-tree names (relative to the
    * index dir, in commit order) and every append batch id applied so far. */
  final case class IndexState(version: Long, dirs: Vector[String],
                              batchIds: Set[String])

  /** Test seam: runs immediately before every CAS attempt (crash-injection
    * and rival-commit interleavings in IndexCommitSpec). */
  @volatile private[graft] var testBeforeCommit: () => Unit = () => ()

  private def logDir(indexDir: String): String =
    MetaLog.join(indexDir, LogDirName)
  private def versionFile(indexDir: String, v: Long): String =
    MetaLog.join(logDir(indexDir), f"$v%020d.json")

  /** One log entry as written: state plus the commit's own metadata —
    * `info` is a small opaque string map the committer may attach (the
    * IVF drift statistics ride here), `kind` is base/append/compact. */
  final case class CommitEntry(version: Long, kind: String,
                               dirs: Vector[String], batchIds: Set[String],
                               info: Map[String, String])

  private def parseEntry(bytes: Array[Byte], v: Long): CommitEntry = {
    val n = mapper.readTree(bytes)
    val dirs = Vector.newBuilder[String]
    n.get("dirs").forEach(d => dirs += d.asText())
    val ids = Set.newBuilder[String]
    val bi = n.get("batch_ids")
    if (bi != null) bi.forEach(b => ids += b.asText())
    val info = Map.newBuilder[String, String]
    val in = n.get("info")
    if (in != null) in.properties().forEach(e => info += e.getKey -> e.getValue.asText())
    val kind = Option(n.get("kind")).map(_.asText()).getOrElse("")
    CommitEntry(v, kind, dirs.result(), ids.result(), info.result())
  }

  private def parse(bytes: Array[Byte], v: Long): IndexState = {
    val e = parseEntry(bytes, v)
    IndexState(v, e.dirs, e.batchIds)
  }

  private def render(dirs: Seq[String], batchIds: Set[String],
                     kind: String, info: Map[String, String]): Array[Byte] = {
    val n: ObjectNode = mapper.createObjectNode()
    n.put("kind", kind)
    val da = n.putArray("dirs")
    dirs.foreach(da.add)
    val ba = n.putArray("batch_ids")
    batchIds.toSeq.sorted.foreach(ba.add)
    if (info.nonEmpty) {
      val io = n.putObject("info")
      info.toSeq.sortBy(_._1).foreach { case (k, v2) => io.put(k, v2) }
    }
    mapper.writeValueAsBytes(n)
  }

  /** Every commit in version order — the maintenance audit surface (the
    * drift TVF reads append commits' info maps from here). O(#commits)
    * reads; commits are per-maintenance-op, not per-row. */
  def history(indexDir: String): Seq[CommitEntry] = {
    val store = MetaLog.storeFor(indexDir)
    store.list(logDir(indexDir))
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json"))
      .flatMap(s => scala.util.Try(s.toLong).toOption).sorted
      .map(v => parseEntry(store.read(versionFile(indexDir, v)), v))
  }

  /** The latest committed state, or None when the index has no pointer log
    * (pre-pointer layout, or not an index dir at all). */
  def load(indexDir: String): Option[IndexState] = {
    val store = MetaLog.storeFor(indexDir)
    val versions = store.list(logDir(indexDir))
      .filter(_.endsWith(".json")).map(_.stripSuffix(".json"))
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    if (versions.isEmpty) None
    else {
      val v = versions.max
      Some(parse(store.read(versionFile(indexDir, v)), v))
    }
  }

  /** CAS-commit `expected.version + 1`; false when a rival won the slot. */
  private def tryCommit(indexDir: String, expected: IndexState,
                        dirs: Seq[String], batchIds: Set[String],
                        kind: String,
                        info: Map[String, String] = Map.empty): Boolean = {
    val store = MetaLog.storeFor(indexDir)
    store.mkdirs(logDir(indexDir))
    testBeforeCommit()
    store.putIfAbsent(versionFile(indexDir, expected.version + 1),
      render(dirs, batchIds, kind, info))
  }

  /** Latest state, bootstrapping version 0 around the legacy tree when no
    * log exists yet (a pre-pointer index touched by pointer-aware
    * maintenance for the first time). */
  private def loadOrBootstrap(indexDir: String, legacyName: String): IndexState = {
    load(indexDir) match {
      case Some(st) => st
      case None =>
        val boot = IndexState(-1L, Vector.empty, Set.empty)
        tryCommit(indexDir, boot, Vector(legacyName), Set.empty, "base")
        // rival bootstrap is fine either way — reload the winner
        load(indexDir).getOrElse(
          throw new IllegalStateException(s"index log bootstrap failed in $indexDir"))
    }
  }

  /** The live data-tree ABSOLUTE paths to read, snapshot-consistent: the
    * latest commit's trees, or the bare legacy tree for pre-pointer
    * indexes. Trees are immutable, so a plan built over this resolution
    * stays valid however many maintenance commits land afterwards (until
    * [[vacuum]] reclaims superseded trees). */
  def resolveDirs(indexDir: String, legacyName: String): Seq[String] =
    load(indexDir) match {
      case Some(st) => st.dirs.map(MetaLog.join(indexDir, _))
      case None => Seq(MetaLog.join(indexDir, legacyName))
    }

  /** Commit a full index BUILD: the first build writes the bare legacy tree
    * name (readable by pre-pointer tooling); a REBUILD into a live index dir
    * writes a fresh versioned tree so running searches keep their snapshot.
    * `write` receives the absolute tree path to produce. Resets
    * `batch_ids` — a rebuild re-reads the corpus, so prior appends are
    * subsumed, and their ids must not suppress future batches. */
  def commitBase(indexDir: String, legacyName: String)(write: String => Unit): Unit =
    load(indexDir) match {
      case None =>
        write(MetaLog.join(indexDir, legacyName))
        val boot = IndexState(-1L, Vector.empty, Set.empty)
        if (!tryCommit(indexDir, boot, Vector(legacyName), Set.empty, "base"))
          throw new graft.meta.ConcurrentCommitException(
            s"index version 0 already committed in $indexDir")
      case Some(st0) =>
        val tree = s"$legacyName-b${st0.version + 1}-${freshSuffix()}"
        write(MetaLog.join(indexDir, tree))
        var st = st0
        while (!tryCommit(indexDir, st, Vector(tree), Set.empty, "base"))
          st = load(indexDir).get
    }

  /** Transactional append: write an immutable delta tree, CAS it into the
    * live set. Returns false (after deleting the staged tree, when one was
    * written) iff `batchId` was already applied — the replay guard. A crash
    * before the CAS leaves the pointer unmoved and one orphan tree for
    * [[vacuum]]. */
  def appendTree(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 legacyName: String, batchId: Option[String],
                 info: Map[String, String] = Map.empty)
                (write: String => Unit): Boolean = {
    var st = loadOrBootstrap(indexDir, legacyName)
    if (batchId.exists(st.batchIds.contains)) return false
    val tree = s"$legacyName-a${st.version + 1}-${freshSuffix()}"
    write(MetaLog.join(indexDir, tree))
    while (true) {
      if (tryCommit(indexDir, st, st.dirs :+ tree,
          st.batchIds ++ batchId, "append", info)) return true
      st = load(indexDir).get
      if (batchId.exists(st.batchIds.contains)) {
        deleteTree(spark, indexDir, tree) // a rival replay of the same batch won
        return false
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Transactional compact: `rewrite(liveTreeAbsPaths, targetAbsPath)`
    * merges the trees read at entry into one new tree; the commit replaces
    * exactly those trees, so delta trees a rival appends DURING the rewrite
    * survive in the committed set. Readers never see a missing tree: the
    * old trees stay on disk until [[vacuum]].
    *
    * A rival COMPACT or REBUILD that lands mid-rewrite is detected and
    * aborts this one loudly (staged tree deleted): once any source tree has
    * left the committed set, committing our target would DUPLICATE its rows
    * (the rival's target holds them too) or resurrect pre-rebuild rows —
    * run one compactor per index; on the abort, the rival's work already
    * folded the layout. Rival APPENDS retry and survive, as documented. */
  def compactTrees(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                   legacyName: String)
                  (rewrite: (Seq[String], String) => Unit): Unit = {
    val st0 = loadOrBootstrap(indexDir, legacyName)
    val tree = s"$legacyName-c${st0.version + 1}-${freshSuffix()}"
    rewrite(st0.dirs.map(MetaLog.join(indexDir, _)), MetaLog.join(indexDir, tree))
    var st = st0
    while (!tryCommit(indexDir, st, tree +: (st.dirs.diff(st0.dirs)),
        st.batchIds, "compact")) {
      st = load(indexDir).get
      if (!st0.dirs.forall(st.dirs.contains)) {
        deleteTree(spark, indexDir, tree)
        throw new graft.meta.ConcurrentCommitException(
          s"rival compact/rebuild replaced source trees in $indexDir while " +
            "this compact was rewriting — committing would duplicate rows; " +
            "aborted (staged tree deleted). Run one compactor per index")
      }
    }
  }

  /** Reclaim data trees no committed reader can reach: children of the
    * index dir named `<legacyName>` or `<legacyName>-*` that the LATEST
    * commit does not reference — superseded pre-compact trees and orphans
    * from crashed maintenance. Run it from the maintenance cadence AFTER a
    * grace period longer than any in-flight query (the Delta VACUUM
    * contract: a search planned against a pre-compact version keeps
    * reading the old trees until vacuumed), and never concurrently with an
    * append (an append's tree is unreferenced until its CAS lands).
    * Returns the deleted tree names. No-op for pre-pointer indexes. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, indexDir: String,
             legacyName: String): Seq[String] =
    load(indexDir) match {
      case None => Seq.empty
      case Some(st) =>
        val live = st.dirs.toSet
        val fs = hadoopFs(spark, indexDir)
        val base = new org.apache.hadoop.fs.Path(indexDir)
        if (!fs.exists(base)) return Seq.empty
        val dead = fs.listStatus(base).toSeq
          .filter(_.isDirectory).map(_.getPath.getName)
          .filter(n => n == legacyName || n.startsWith(s"$legacyName-"))
          .filterNot(live.contains)
        dead.foreach(n =>
          fs.delete(new org.apache.hadoop.fs.Path(base, n), true))
        dead
    }

  private def deleteTree(spark: org.apache.spark.sql.SparkSession,
                         indexDir: String, tree: String): Unit = {
    val fs = hadoopFs(spark, indexDir)
    fs.delete(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(indexDir), tree), true)
    ()
  }

  private def hadoopFs(spark: org.apache.spark.sql.SparkSession,
                       dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** Collision-proof tree-name suffix (tree names never carry semantics —
    * the commit log is the source of truth; the suffix only keeps two
    * same-version writers from colliding on a path). */
  private def freshSuffix(): String =
    java.util.UUID.randomUUID().toString.take(8)

  /** Schema of the first tree that HAS parquet footers — a committed tree
    * can be legitimately empty (a compact whose rows were all globally
    * capped away, an append of an empty batch) and carries nothing to
    * infer from; reading an empty tree under an explicit schema is fine. */
  private[operators] def inferAcross(spark: org.apache.spark.sql.SparkSession,
                                     dirs: Seq[String])
      : Option[org.apache.spark.sql.types.StructType] =
    dirs.view.flatMap(d =>
      scala.util.Try(spark.read.parquet(d).schema).toOption).headOption
}
