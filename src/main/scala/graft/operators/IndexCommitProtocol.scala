package graft.operators

/** PURE model of the persisted-index maintenance protocol —
  * [[IndexCommit]]'s append/compact CAS loops with every store round-trip
  * an explicit atomic transition, so IndexCommitProtocolSpec can enumerate
  * EVERY interleaving of rival appenders, rival compactors, and crashes —
  * the [[graft.eslog.FanOutProtocol]] / [[graft.eslog.FanInProtocol]]
  * treatment applied to the third commit protocol in the engine (the one
  * the ANN / media / MinHash index families share).
  *
  * Fidelity contract (each transition cites the production code it
  * mirrors; a change THERE must change HERE — all in IndexCommit.scala):
  *
  *  - `ALoad` = append's `loadOrBootstrap` + the replay guard
  *    (`batchId.exists(st.batchIds.contains)` → return false before any
  *    tree is written).
  *  - `AWrite` = the delta-tree write (`write(MetaLog.join(...))`) —
  *    crash here leaves an ORPHAN tree and an unmoved pointer.
  *  - `ACommit` = `tryCommit` at `st.version + 1`; a lost CAS reloads and
  *    EITHER detects a rival replay of the same batch (delete the staged
  *    tree, return false — `appendTree`'s in-loop re-check) OR retries
  *    against the fresh state.
  *  - `CLoad`/`CWrite` = compact's `loadOrBootstrap` + `rewrite(...)` over
  *    the trees read at entry (immutable, so the mid-rewrite content is
  *    exactly the entry snapshot's).
  *  - `CCommit` = compact's `tryCommit` of `target +: (st.dirs diff
  *    st0.dirs)`; a lost CAS reloads and EITHER detects that a source tree
  *    left the committed set (rival compact/rebuild — delete the staged
  *    tree, ABORT loudly: committing would duplicate its rows) OR retries
  *    carrying rival-appended trees forward.
  *
  * Content is modeled as label MULTISETS (one label per applied batch, one
  * for the base build): "each label exactly once in every committed
  * snapshot" IS the no-duplication/no-loss claim, and a multiset is what a
  * (band, sig) or (cell, vec) parquet row set actually is — a set union
  * would hide exactly the double-commit bug the compact guard exists for.
  * Vacuum is deliberately NOT enumerated concurrently (its scaladoc
  * forbids that: grace period, never alongside an append); the spec
  * applies it at terminal states and asserts it reclaims precisely the
  * unreferenced trees.
  */
object IndexCommitProtocol {

  type Tree = Int
  type Version = Int

  /** One committed log entry: live tree ids + applied batch ids —
    * IndexCommit's `IndexState`, with dirs as model tree ids. */
  final case class Entry(dirs: Vector[Tree], batchIds: Set[String])

  /** The whole store: the commit log (index = version), every tree on disk
    * with its row labels (committed AND staged/orphaned), and a fresh-name
    * counter (production's uuid suffix). */
  final case class Global(log: Vector[Entry], disk: Map[Tree, Vector[String]],
                          nextTree: Tree) {
    def latestVersion: Version = log.size - 1
    def latest: Entry = log.last
  }

  /** A freshly built index: version 0 = the base tree (commitBase). */
  def initial: Global =
    Global(Vector(Entry(Vector(0), Set.empty)), Map(0 -> Vector("base")), 1)

  /** The row multiset a reader of `version` sees (trees are immutable and
    * stay on disk until vacuum, so any committed snapshot stays readable). */
  def content(g: Global, version: Version): Vector[String] =
    g.log(version).dirs.flatMap(g.disk(_))

  /** A maintenance job's program counter between atomic store round-trips. */
  sealed trait Pc
  /** Append `batchId`: about to load the latest state (replay guard). */
  final case class ALoad(batchId: String) extends Pc
  /** About to write the delta tree (state `st` read, guard passed). */
  final case class AWrite(batchId: String, st: Version) extends Pc
  /** About to CAS `st + 1` committing staged tree `tree`. */
  final case class ACommit(batchId: String, st: Version, tree: Tree) extends Pc
  /** Compact: about to load the entry snapshot. */
  case object CLoad extends Pc
  /** About to rewrite `st0`'s trees into one target. */
  final case class CWrite(st0: Version) extends Pc
  /** About to CAS `st + 1` replacing `st0`'s trees with `tree`. */
  final case class CCommit(st0: Version, st: Version, tree: Tree) extends Pc
  /** Run finished; `applied` = the append landed (false = replay skip). */
  final case class Done(applied: Boolean) extends Pc
  /** Compact aborted loudly on a rival compact/rebuild (staged tree
    * deleted) — the ConcurrentCommitException route. */
  case object Aborted extends Pc

  /** One job's atomic step. The two mutation seams exist so the spec can
    * prove the enumeration has teeth: `compactGuard = false` drops the
    * rival-compact source-tree check (the pre-r12 bug: both compact targets
    * commit, every row duplicated), `replayRecheck = false` drops append's
    * post-lost-CAS replay re-check (a rival delivery of the same batch
    * lands twice). Production behavior is both `true`. */
  def step(g: Global, pc: Pc, compactGuard: Boolean = true,
           replayRecheck: Boolean = true): (Global, Pc) = pc match {
    case ALoad(b) =>
      val st = g.latestVersion
      if (g.log(st).batchIds.contains(b)) (g, Done(false)) // replay guard
      else (g, AWrite(b, st))
    case AWrite(b, st) =>
      val t = g.nextTree
      (g.copy(disk = g.disk + (t -> Vector(b)), nextTree = t + 1),
        ACommit(b, st, t))
    case ACommit(b, st, t) =>
      val cur = g.latestVersion
      if (cur == st) { // putIfAbsent(st + 1) wins: versions are contiguous
        val e = g.log(st)
        (g.copy(log = g.log :+ Entry(e.dirs :+ t, e.batchIds + b)), Done(true))
      } else if (replayRecheck && g.log(cur).batchIds.contains(b))
        (g.copy(disk = g.disk - t), Done(false)) // rival replay won: delete staged
      else (g, ACommit(b, cur, t)) // retry against the fresh state
    case CLoad =>
      (g, CWrite(g.latestVersion))
    case CWrite(st0) =>
      val t = g.nextTree
      val merged = content(g, st0) // immutable source trees: entry snapshot
      (g.copy(disk = g.disk + (t -> merged), nextTree = t + 1),
        CCommit(st0, st0, t))
    case CCommit(st0, st, t) =>
      val cur = g.latestVersion
      if (cur == st) {
        val e = g.log(st)
        val dirs = t +: e.dirs.diff(g.log(st0).dirs) // rival appends survive
        (g.copy(log = g.log :+ Entry(dirs, e.batchIds)), Done(true))
      } else if (compactGuard &&
          !g.log(st0).dirs.forall(g.log(cur).dirs.contains))
        (g.copy(disk = g.disk - t), Aborted) // rival compact/rebuild: loud abort
      else (g, CCommit(st0, cur, t))
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
