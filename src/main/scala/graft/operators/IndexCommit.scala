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
    * index dir, in commit order), every append batch id applied so far, the
    * SIDECAR files this snapshot reads (key → relative path; key doubles as
    * the legacy bare name readers fall back to), and the version of the
    * base/rebuild commit this state derives from (`baseVersion` — the
    * quantizer/params generation: appends derived against one generation
    * must never land on another, see [[appendTree]]'s fence). */
  final case class IndexState(version: Long, dirs: Vector[String],
                              batchIds: Set[String],
                              sidecars: Map[String, String] = Map.empty,
                              baseVersion: Long = 0L)

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
                               info: Map[String, String],
                               sidecars: Map[String, String],
                               baseVersion: Long)

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
    val side = Map.newBuilder[String, String]
    val sn = n.get("sidecars")
    if (sn != null) sn.properties().forEach(e => side += e.getKey -> e.getValue.asText())
    val kind = Option(n.get("kind")).map(_.asText()).getOrElse("")
    // pre-sidecar entries (r12-early logs) carry neither field: empty
    // sidecar map = bare-name fallback, base generation 0
    val baseV = Option(n.get("base_version")).map(_.asLong()).getOrElse(0L)
    CommitEntry(v, kind, dirs.result(), ids.result(), info.result(),
      side.result(), baseV)
  }

  private def parse(bytes: Array[Byte], v: Long): IndexState = {
    val e = parseEntry(bytes, v)
    IndexState(v, e.dirs, e.batchIds, e.sidecars, e.baseVersion)
  }

  private def render(dirs: Seq[String], batchIds: Set[String],
                     kind: String, info: Map[String, String],
                     sidecars: Map[String, String],
                     baseVersion: Long): Array[Byte] = {
    val n: ObjectNode = mapper.createObjectNode()
    n.put("kind", kind)
    n.put("base_version", baseVersion)
    val da = n.putArray("dirs")
    dirs.foreach(da.add)
    val ba = n.putArray("batch_ids")
    batchIds.toSeq.sorted.foreach(ba.add)
    if (info.nonEmpty) {
      val io = n.putObject("info")
      info.toSeq.sortBy(_._1).foreach { case (k, v2) => io.put(k, v2) }
    }
    if (sidecars.nonEmpty) {
      val so = n.putObject("sidecars")
      sidecars.toSeq.sortBy(_._1).foreach { case (k, v2) => so.put(k, v2) }
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

  /** CAS-commit `expected.version + 1`; false when a rival won the slot.
    * Base commits stamp their own version as the new `baseVersion`
    * generation; append/compact carry the expected state's forward. */
  private def tryCommit(indexDir: String, expected: IndexState,
                        dirs: Seq[String], batchIds: Set[String],
                        kind: String,
                        info: Map[String, String] = Map.empty,
                        sidecars: Map[String, String] = Map.empty): Boolean = {
    val store = MetaLog.storeFor(indexDir)
    store.mkdirs(logDir(indexDir))
    testBeforeCommit()
    val v = expected.version + 1
    val (side, baseV) =
      if (kind == "base") (sidecars, v)
      else (expected.sidecars, expected.baseVersion)
    store.putIfAbsent(versionFile(indexDir, v),
      render(dirs, batchIds, kind, info, side, baseV))
  }

  /** Latest state, bootstrapping version 0 around the legacy tree when no
    * log exists yet (a pre-pointer index touched by pointer-aware
    * maintenance for the first time). */
  private[operators] def loadOrBootstrap(indexDir: String,
                                         legacyName: String): IndexState = {
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

  /** One committed snapshot for READERS: tree paths + sidecar resolution
    * from the SAME state, so a commit landing between two separate loads
    * can never pair one generation's sidecars (centroids, params) with
    * another's trees. `version == -1` marks the pre-pointer fallback. */
  final case class ReadSnapshot(indexDir: String, version: Long,
                                baseVersion: Long, dirs: Seq[String],
                                sidecars: Map[String, String]) {
    /** Absolute path of sidecar `key` — the committed name, or the bare
      * legacy name (`key` itself) for pre-sidecar snapshots. */
    def sidecar(key: String): String =
      MetaLog.join(indexDir, sidecars.getOrElse(key, key))
  }

  /** Load one snapshot for a read path (never bootstraps — reads must stay
    * side-effect-free on pre-pointer indexes). */
  def readSnapshot(indexDir: String, legacyName: String): ReadSnapshot =
    load(indexDir) match {
      case Some(st) => ReadSnapshot(indexDir, st.version, st.baseVersion,
        st.dirs.map(MetaLog.join(indexDir, _)), st.sidecars)
      case None => ReadSnapshot(indexDir, -1L, 0L,
        Seq(MetaLog.join(indexDir, legacyName)), Map.empty)
    }

  /** [[readSnapshot]] with an optional TIME-TRAVEL version — the reader
    * plumbing every index family's search/probe shares. */
  def readSnapshot(indexDir: String, legacyName: String,
                   version: Option[Long]): ReadSnapshot =
    version.map(readSnapshotAt(indexDir, _))
      .getOrElse(readSnapshot(indexDir, legacyName))

  /** TIME TRAVEL: the snapshot at a PAST commit `version` — every commit
    * entry is a complete generation-pure state (trees + sidecars), so
    * yesterday's search/probe reproduces exactly, as long as [[vacuum]]
    * hasn't reclaimed that version's trees yet (the stream `graft_scan
    * ('dir', version)` contract applied to indexes; version ids from
    * [[history]] / `graft_index_describe`). Fails loudly on an unknown
    * version or a pre-pointer index. */
  def readSnapshotAt(indexDir: String, version: Long): ReadSnapshot = {
    val store = MetaLog.storeFor(indexDir)
    val bytes =
      try store.read(versionFile(indexDir, version))
      catch { case scala.util.control.NonFatal(e) =>
        throw new IllegalArgumentException(
          s"index version $version does not exist in $indexDir " +
            "(version ids come from graft_index_describe; pre-pointer " +
            "indexes have no versions)", e)
      }
    val st = parse(bytes, version)
    ReadSnapshot(indexDir, st.version, st.baseVersion,
      st.dirs.map(MetaLog.join(indexDir, _)), st.sidecars)
  }

  /** The live data-tree ABSOLUTE paths to read, snapshot-consistent: the
    * latest commit's trees, or the bare legacy tree for pre-pointer
    * indexes. Trees are immutable, so a plan built over this resolution
    * stays valid however many maintenance commits land afterwards (until
    * [[vacuum]] reclaims superseded trees). Paths that ALSO read a sidecar
    * must use [[readSnapshot]] so both resolve from one state. */
  def resolveDirs(indexDir: String, legacyName: String): Seq[String] =
    readSnapshot(indexDir, legacyName).dirs

  /** A collision-proof sidecar file name for a REBUILD into a live index
    * (`key` stays the bare legacy name on a first build, so pre-pointer
    * tooling keeps reading it). */
  def sidecarName(indexDir: String, key: String): String =
    if (load(indexDir).isEmpty) key else s"$key-r${freshSuffix()}"

  /** Commit a full index BUILD: the first build writes the bare legacy tree
    * name (readable by pre-pointer tooling); a REBUILD into a live index dir
    * writes a fresh versioned tree so running searches keep their snapshot.
    * `write` receives the absolute tree path to produce. Resets
    * `batch_ids` — a rebuild re-reads the corpus, so prior appends are
    * subsumed, and their ids must not suppress future batches — and stamps
    * a NEW `baseVersion` generation, which fences any in-flight append
    * derived against the old quantizer/params ([[appendTree]]). `sidecars`
    * names the generation's sidecar files (written by the caller BEFORE
    * this call, under [[sidecarName]] names, so the pointer flip reveals a
    * complete consistent snapshot). */
  def commitBase(indexDir: String, legacyName: String,
                 sidecars: Map[String, String] = Map.empty)
                (write: String => Unit): Unit =
    load(indexDir) match {
      case None =>
        // Stage under a fresh name, then ATOMICALLY claim the bare legacy
        // name with a rename (rename refuses an existing destination):
        // writing the bare name directly would let a LOSING rival first
        // build overwrite the winner's already-committed tree bytes before
        // its own CAS throws — silent generation mixing. The rename loser
        // deletes its staged tree and aborts without touching the winner's
        // data; a crash between rename and CAS leaves exactly the
        // pre-pointer layout (bare tree, no log), readable via the legacy
        // fallback and bootstrapped by the next maintenance op. Caller-side
        // SIDECARS keep bare names on first builds (pre-pointer tooling
        // compat), so on stores without atomic rename (S3) run ONE initial
        // builder per index — the one-compactor contract's first-build twin.
        val staged = s"$legacyName-s${freshSuffix()}"
        write(MetaLog.join(indexDir, staged))
        val fs = fsFor(indexDir)
        val base = new org.apache.hadoop.fs.Path(indexDir)
        val stagedP = new org.apache.hadoop.fs.Path(base, staged)
        val bareP = new org.apache.hadoop.fs.Path(base, legacyName)
        // Claim the bare name by rename. Hadoop rename has POSIX mv
        // semantics — onto an EXISTING directory it nests the source inside
        // it — so an existing bare tree (pre-pointer rebuild, or a rival
        // that raced ahead) is checked first, and a rename that nested
        // anyway (rival won between the check and the rename) is detected
        // by the fresh-suffixed name and undone; the winner's bytes are
        // never touched either way.
        val nestedP = new org.apache.hadoop.fs.Path(bareP, staged)
        val claimed =
          !fs.exists(bareP) && fs.rename(stagedP, bareP) && {
            if (fs.exists(nestedP)) { fs.rename(nestedP, stagedP); false }
            else true
          }
        if (claimed) {
          val boot = IndexState(-1L, Vector.empty, Set.empty)
          if (!tryCommit(indexDir, boot, Vector(legacyName), Set.empty,
              "base", sidecars = sidecars))
            // Only a concurrent maintenance bootstrap can win v0 here (a
            // rival first build could not have claimed the bare name), and
            // its v0 references exactly the tree this rename installed —
            // but with an EMPTY sidecar map where this build committed
            // names. Maintenance concurrent with a first build is outside
            // the contract; fail loudly rather than guess.
            throw new graft.meta.ConcurrentCommitException(
              s"index version 0 already committed in $indexDir")
        } else {
          // The bare name is already taken: a rival first build won it, or
          // this is a PRE-POINTER index being rebuilt in place. Either way
          // the staged tree is a complete build — commit it as a rebuild on
          // top of whatever state exists (bootstrapping version 0 around
          // the bare tree when no log does), never overwriting the bare
          // tree's bytes.
          var st = loadOrBootstrap(indexDir, legacyName)
          while (!tryCommit(indexDir, st, Vector(staged), Set.empty, "base",
              sidecars = sidecars))
            st = load(indexDir).get
        }
      case Some(st0) =>
        val tree = s"$legacyName-b${st0.version + 1}-${freshSuffix()}"
        write(MetaLog.join(indexDir, tree))
        var st = st0
        while (!tryCommit(indexDir, st, Vector(tree), Set.empty, "base",
            sidecars = sidecars))
          st = load(indexDir).get
    }

  /** Transactional append: write an immutable delta tree, CAS it into the
    * live set. Returns false (after deleting the staged tree, when one was
    * written) iff `batchId` was already applied — the replay guard. A crash
    * before the CAS leaves the pointer unmoved and one orphan tree for
    * [[vacuum]].
    *
    * `derivedFromBase` is the REBUILD FENCE: the `baseVersion` of the
    * snapshot the caller derived this batch's rows from (the state whose
    * centroids/params it read). If a rebuild lands between that read and
    * the commit, the rows were computed with a superseded quantizer/params
    * generation — committing them onto the new index would silently mix
    * generations (stale-centroid cell assignments, old-k signatures), so
    * the append deletes its staged tree and aborts loudly instead. Callers
    * that read no sidecars may pass None (the fence still applies between
    * this function's own load and its CAS). */
  def appendTree(spark: org.apache.spark.sql.SparkSession, indexDir: String,
                 legacyName: String, batchId: Option[String],
                 info: Map[String, String] = Map.empty,
                 derivedFromBase: Option[Long] = None)
                (write: String => Unit): Boolean = {
    var st = loadOrBootstrap(indexDir, legacyName)
    val derived0 = derivedFromBase.getOrElse(st.baseVersion)
    def fence(at: IndexState, staged: Option[String]): Unit =
      if (at.baseVersion != derived0) {
        staged.foreach(deleteTree(spark, indexDir, _))
        throw new graft.meta.ConcurrentCommitException(
          s"index rebuilt under this append in $indexDir (generation " +
            s"$derived0 -> ${at.baseVersion}) — the batch was derived with " +
            "superseded sidecars; aborted (staged tree deleted). Re-run " +
            "the append against the new index")
      }
    fence(st, None)
    if (batchId.exists(st.batchIds.contains)) return false
    val tree = s"$legacyName-a${st.version + 1}-${freshSuffix()}"
    write(MetaLog.join(indexDir, tree))
    while (true) {
      if (tryCommit(indexDir, st, st.dirs :+ tree,
          st.batchIds ++ batchId, "append", info)) return true
      val st2 = load(indexDir).get
      fence(st2, Some(tree))
      st = st2
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
                  (rewrite: (Seq[String], String) => Unit): Unit =
    compactTreesFrom(spark, indexDir, legacyName,
      loadOrBootstrap(indexDir, legacyName))(rewrite)

  /** [[compactTrees]] against an explicitly-loaded entry snapshot — for
    * compactors that ALSO read a sidecar (the media library's df cap):
    * resolving params and source trees from ONE state closes the window
    * where a rebuild lands between the two loads and the rewrite applies
    * one generation's params to another's trees. Load the snapshot with
    * [[loadOrBootstrap]]-via-[[compactTrees]] or pass [[load]]'s result. */
  def compactTreesFrom(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, legacyName: String, st0: IndexState)
                      (rewrite: (Seq[String], String) => Unit): Unit = {
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
    * from crashed maintenance — plus SIDECAR generations superseded by a
    * rebuild (children named `<key>-*` for each sidecar key the latest
    * commit carries, keeping only the referenced one; bare pre-pointer
    * sidecar names are never touched). Run it from the maintenance cadence
    * AFTER a grace period longer than any in-flight query (the Delta
    * VACUUM contract: a search planned against a pre-compact version keeps
    * reading the old trees until vacuumed), and never concurrently with
    * ANY other maintenance op — an append's delta tree AND a compact's or
    * rebuild's staged target tree are all unreferenced until their CAS
    * lands, and vacuum cannot tell them from crash orphans by name alone.
    * `graceMs > 0` is the belt for that suspender: candidates modified
    * within the last `graceMs` are skipped, so staged trees of in-flight
    * maintenance (and trees a just-superseded reader may still be
    * scanning) survive; size it above the longest maintenance op plus the
    * longest query. Returns the deleted names. No-op for pre-pointer
    * indexes. */
  def vacuum(spark: org.apache.spark.sql.SparkSession, indexDir: String,
             legacyName: String, graceMs: Long = 0L): Seq[String] =
    load(indexDir) match {
      case None => Seq.empty
      case Some(st) =>
        val live = st.dirs.toSet ++ st.sidecars.values
        val fs = hadoopFs(spark, indexDir)
        val base = new org.apache.hadoop.fs.Path(indexDir)
        if (!fs.exists(base)) return Seq.empty
        val prefixes = legacyName +: st.sidecars.keys.toSeq
        val cutoff =
          if (graceMs <= 0L) Long.MaxValue
          else System.currentTimeMillis() - graceMs
        val dead = fs.listStatus(base).toSeq
          .filter(_.isDirectory)
          .filter(_.getModificationTime < cutoff)
          .map(_.getPath.getName)
          .filter(n => prefixes.exists(p => n == p || n.startsWith(s"$p-")))
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

  /** Hadoop FS without a caller-provided session — the active session's
    * conf when one exists (executor-side settings ride along), a bare
    * Configuration otherwise ([[commitBase]] has no session parameter). */
  private def fsFor(dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir).getFileSystem(
      org.apache.spark.sql.SparkSession.getActiveSession
        .map(_.sessionState.newHadoopConf())
        .getOrElse(new org.apache.hadoop.conf.Configuration()))

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
