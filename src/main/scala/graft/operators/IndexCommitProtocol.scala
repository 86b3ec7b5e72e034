package graft.operators

/** PURE model of the persisted-index maintenance protocol —
  * [[IndexCommit]]'s append/compact/rebuild CAS loops with every store
  * round-trip an explicit atomic transition, so IndexCommitProtocolSpec
  * can enumerate EVERY interleaving of rival appenders, rival compactors,
  * rebuilders, and crashes — the [[graft.eslog.FanOutProtocol]] /
  * [[graft.eslog.FanInProtocol]] treatment applied to the third commit
  * protocol in the engine (the one the ANN / media / MinHash index
  * families share).
  *
  * Fidelity contract (each transition cites the production code it
  * mirrors; a change THERE must change HERE — all in IndexCommit.scala):
  *
  *  - `ALoad` = append's `loadOrBootstrap` + the replay guard
  *    (`batchId.exists(st.batchIds.contains)` → return false before any
  *    tree is written) + recording the GENERATION (`baseVersion`) the
  *    batch derives from (production: the caller's `readSnapshot`, whose
  *    sidecars — centroids, params — the rows are computed with).
  *  - `AWrite` = the delta-tree write (`write(MetaLog.join(...))`) —
  *    crash here leaves an ORPHAN tree and an unmoved pointer.
  *  - `ACommit` = `tryCommit` at `st.version + 1`; a lost CAS reloads and
  *    EITHER hits the GENERATION FENCE (a rebuild landed: the rows were
  *    derived with superseded sidecars — delete the staged tree, abort
  *    loudly) OR detects a rival replay of the same batch (delete the
  *    staged tree, return false) OR retries against the fresh state.
  *  - `CLoad`/`CWrite` = compact's `loadOrBootstrap` + `rewrite(...)` over
  *    the trees read at entry (immutable, so the mid-rewrite content is
  *    exactly the entry snapshot's; the target inherits that snapshot's
  *    generation).
  *  - `CCommit` = compact's `tryCommit` of `target +: (st.dirs diff
  *    st0.dirs)`; a lost CAS reloads and EITHER detects that a source tree
  *    left the committed set (rival compact/rebuild — delete the staged
  *    tree, ABORT loudly: committing would duplicate its rows) OR retries
  *    carrying rival-appended trees forward.
  *  - `BLoad`/`BWrite`/`BCommit` = `commitBase`'s rebuild branch: a fresh
  *    corpus tree replaces EVERYTHING (dirs = [tree], batch ids reset —
  *    prior appends subsumed by design) and stamps a NEW generation; its
  *    lost-CAS retry is unconditional, exactly like production.
  *
  * Content is modeled as label MULTISETS (one label per applied batch, one
  * per base build): "each label exactly once in every committed snapshot"
  * IS the no-duplication/no-loss claim. Every tree also records the
  * generation it was DERIVED against; "every live tree's generation ==
  * the snapshot's baseVersion" IS the no-stale-sidecar-rows claim the
  * rebuild fence exists for. Vacuum is deliberately NOT enumerated
  * concurrently (its scaladoc forbids that: grace period, never alongside
  * an append); the spec applies it at terminal states and asserts it
  * reclaims precisely the unreferenced trees.
  */
object IndexCommitProtocol {

  type Tree = Int
  type Version = Int

  /** One committed log entry: live tree ids + applied batch ids + the
    * generation (base-commit version) — IndexCommit's `IndexState`. */
  final case class Entry(dirs: Vector[Tree], batchIds: Set[String],
                         baseVersion: Long)

  /** One tree on disk: its row labels and the generation whose sidecars
    * (centroids/params) its rows were derived with. */
  final case class TreeData(rows: Vector[String], gen: Long)

  /** The whole store: the commit log (index = version), every tree on disk
    * (committed AND staged/orphaned), and a fresh-name counter
    * (production's uuid suffix). */
  final case class Global(log: Vector[Entry], disk: Map[Tree, TreeData],
                          nextTree: Tree) {
    def latestVersion: Version = log.size - 1
    def latest: Entry = log.last
  }

  /** A freshly built index: version 0 = the base tree, generation 0. */
  def initial: Global =
    Global(Vector(Entry(Vector(0), Set.empty, 0L)),
      Map(0 -> TreeData(Vector("base"), 0L)), 1)

  /** The row multiset a reader of `version` sees (trees are immutable and
    * stay on disk until vacuum, so any committed snapshot stays readable). */
  def content(g: Global, version: Version): Vector[String] =
    g.log(version).dirs.flatMap(g.disk(_).rows)

  /** A maintenance job's program counter between atomic store round-trips. */
  sealed trait Pc
  /** Append `batchId`: about to load the latest state (replay guard +
    * generation capture). */
  final case class ALoad(batchId: String) extends Pc
  /** About to write the delta tree (state `st` read, guard passed, rows
    * derived against generation `gen`). */
  final case class AWrite(batchId: String, st: Version, gen: Long) extends Pc
  /** About to CAS `st + 1` committing staged tree `tree` (derived at `gen`). */
  final case class ACommit(batchId: String, st: Version, gen: Long,
                           tree: Tree) extends Pc
  /** Compact: about to load the entry snapshot. */
  case object CLoad extends Pc
  /** About to rewrite `st0`'s trees into one target. */
  final case class CWrite(st0: Version) extends Pc
  /** About to CAS `st + 1` replacing `st0`'s trees with `tree`. */
  final case class CCommit(st0: Version, st: Version, tree: Tree) extends Pc
  /** Rebuild: about to load the latest state. */
  case object BLoad extends Pc
  /** About to write the fresh corpus tree. */
  final case class BWrite(st: Version) extends Pc
  /** About to CAS `st + 1` replacing everything with `tree` (new
    * generation = the version this commit lands at). */
  final case class BCommit(st: Version, tree: Tree) extends Pc
  /** Run finished; `applied` = the op landed (false = replay skip). */
  final case class Done(applied: Boolean) extends Pc
  /** Aborted loudly (staged tree deleted) — the ConcurrentCommitException
    * routes: rival compact/rebuild under a compact, rebuild under an
    * append. */
  case object Aborted extends Pc

  /** One job's atomic step. The mutation seams exist so the spec can prove
    * the enumeration has teeth: `compactGuard = false` drops the
    * rival-compact source-tree check (both compact targets commit, every
    * row duplicated), `replayRecheck = false` drops append's post-lost-CAS
    * replay re-check (a rival delivery of the same batch lands twice),
    * `rebuildFence = false` drops append's generation fence (rows derived
    * against superseded sidecars land on the rebuilt index). Production
    * behavior is all `true`. */
  def step(g: Global, pc: Pc, compactGuard: Boolean = true,
           replayRecheck: Boolean = true,
           rebuildFence: Boolean = true): (Global, Pc) = pc match {
    case ALoad(b) =>
      val st = g.latestVersion
      if (g.log(st).batchIds.contains(b)) (g, Done(false)) // replay guard
      else (g, AWrite(b, st, g.log(st).baseVersion))
    case AWrite(b, st, gen) =>
      val t = g.nextTree
      (g.copy(disk = g.disk + (t -> TreeData(Vector(b), gen)),
        nextTree = t + 1), ACommit(b, st, gen, t))
    case ACommit(b, st, gen, t) =>
      val cur = g.latestVersion
      if (cur == st) { // putIfAbsent(st + 1) wins: versions are contiguous
        val e = g.log(st)
        (g.copy(log = g.log :+ Entry(e.dirs :+ t, e.batchIds + b,
          e.baseVersion)), Done(true))
      } else if (rebuildFence && g.log(cur).baseVersion != gen)
        (g.copy(disk = g.disk - t), Aborted) // rebuild landed: stale sidecars
      else if (replayRecheck && g.log(cur).batchIds.contains(b))
        (g.copy(disk = g.disk - t), Done(false)) // rival replay won: delete staged
      else (g, ACommit(b, cur, gen, t)) // retry against the fresh state
    case CLoad =>
      (g, CWrite(g.latestVersion))
    case CWrite(st0) =>
      val t = g.nextTree
      val merged = content(g, st0) // immutable source trees: entry snapshot
      (g.copy(disk = g.disk +
        (t -> TreeData(merged, g.log(st0).baseVersion)),
        nextTree = t + 1), CCommit(st0, st0, t))
    case CCommit(st0, st, t) =>
      val cur = g.latestVersion
      if (cur == st) {
        val e = g.log(st)
        val dirs = t +: e.dirs.diff(g.log(st0).dirs) // rival appends survive
        (g.copy(log = g.log :+ Entry(dirs, e.batchIds, e.baseVersion)),
          Done(true))
      } else if (compactGuard &&
          !g.log(st0).dirs.forall(g.log(cur).dirs.contains))
        (g.copy(disk = g.disk - t), Aborted) // rival compact/rebuild: loud abort
      else (g, CCommit(st0, cur, t))
    case BLoad =>
      (g, BWrite(g.latestVersion))
    case BWrite(st) =>
      val t = g.nextTree
      // the fresh corpus tree; its generation is stamped when its commit
      // wins (the tree content itself is version-independent, like a real
      // rebuild's corpus re-read)
      (g.copy(disk = g.disk + (t -> TreeData(Vector("base"), -1L)),
        nextTree = t + 1), BCommit(st, t))
    case BCommit(st, t) =>
      val cur = g.latestVersion
      if (cur == st) {
        val v = (st + 1).toLong
        (g.copy(log = g.log :+ Entry(Vector(t), Set.empty, v),
          disk = g.disk + (t -> g.disk(t).copy(gen = v))), Done(true))
      } else (g, BCommit(cur, t)) // unconditional retry, like production
    case Done(_) | Aborted => (g, pc) // terminal
  }

  /** [[IndexCommit.vacuum]] on the model: delete every tree the LATEST
    * commit does not reference (run at quiescence, as the contract
    * requires). Returns the reclaimed tree ids. */
  def vacuum(g: Global): (Global, Set[Tree]) = {
    val live = g.latest.dirs.toSet
    val dead = g.disk.keySet.diff(live)
    (g.copy(disk = g.disk.view.filterKeys(live).toMap), dead)
  }
}
