package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

import graft.meta._

/** The [[LogStore]] Scaladoc contract, executable — every implementation
  * must pass the same suite: exactly-one-winner conditional create, atomic
  * replace, list-after-put, and the full MetaLog commit/CAS/checkpoint
  * protocol layered on top. Concrete subclasses bind the FS impl and the
  * object-store impl; porting the log to a new backend means adding a third
  * subclass, not new tests.
  */
abstract class LogStoreContractSpec extends AnyFunSuite {
  def storeName: String
  /** A fresh store + a fresh root directory path valid for it. */
  def freshStore(): (LogStore, String)

  private def withMetaLogStore[A](s: LogStore)(f: => A): A = {
    val prev = MetaLog.store
    MetaLog.store = s
    try f finally MetaLog.store = prev
  }

  test(s"$storeName: putIfAbsent has exactly one winner under contention") {
    val (store, root) = freshStore()
    val p = MetaLog.join(root, "probe")
    store.mkdirs(root)
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val wins = Await.result(
      Future.sequence((0 until 16).map(i => Future(store.putIfAbsent(p, s"w$i".getBytes)))),
      1.minute)
    assert(wins.count(identity) == 1, wins.toString)
    // the surviving content is the winner's, byte-for-byte
    val winner = wins.indexOf(true)
    assert(new String(store.read(p)) == s"w$winner")
    // and the key is immediately visible to exists + list (read-after-write)
    assert(store.exists(p))
    assert(store.list(root).contains("probe"))
  }

  test(s"$storeName: putAtomic replaces; delete is idempotent") {
    val (store, root) = freshStore()
    val p = MetaLog.join(root, "ptr")
    store.mkdirs(root)
    store.putAtomic(p, "1".getBytes)
    store.putAtomic(p, "2".getBytes)
    assert(new String(store.read(p)) == "2")
    store.delete(p)
    assert(!store.exists(p))
    store.delete(p) // absent key: no-op, no throw
  }

  test(s"$storeName: list returns immediate children only") {
    val (store, root) = freshStore()
    val dir = MetaLog.join(root, "d")
    store.mkdirs(dir)
    store.mkdirs(MetaLog.join(dir, "sub"))
    store.putAtomic(MetaLog.join(dir, "a.json"), "x".getBytes)
    store.putAtomic(MetaLog.join(dir, "sub/b.json"), "y".getBytes)
    val names = store.list(dir)
    assert(names.contains("a.json"), names.toString)
    assert(names.contains("sub"), names.toString)
    assert(!names.exists(_.contains("b.json")), names.toString)
    assert(store.isDir(dir) && !store.isDir(MetaLog.join(root, "nope")))
  }

  test(s"$storeName: MetaLog protocol — commits, checkpoint crossing, reload") {
    val (store, root) = freshStore()
    withMetaLogStore(store) {
      val dir = s"$root/stream1"
      var st = MetaLog.commit(dir, StreamState.empty, Seq(CreateStream(1L, 1, 1, -1L)))
      st = MetaLog.commit(dir, st, Seq(OpenStream(1L)))
      st = MetaLog.commit(dir, st, Seq(OpenSegment(0, 0L, 1L)))
      st = MetaLog.commit(dir, st,
        Seq(CommitFiles(0, 1L, Seq(FileMeta("f-0", 10, 100L, 0, 10, 0L, 0L)))))
      // cross the checkpoint interval so load exercises checkpoint + deltas
      (0 until 20).foreach { i => st = MetaLog.commit(dir, st, Seq(KvPut(s"k$i", "v"))) }
      assert(MetaLog.load(dir) == st)
      assert(MetaLog.loadAt(dir, 3).nextOffset == 10)
      assert(MetaLog.loadAt(dir, 3).kv.isEmpty)
      // stale CAS token loses
      assertThrows[ConcurrentCommitException](
        MetaLog.commit(dir, st.copy(version = st.version - 1), Seq(KvPut("x", "y"))))
    }
  }

  test(s"$storeName: concurrent commitWithRetry linearizes, no commit lost") {
    val (store, root) = freshStore()
    withMetaLogStore(store) {
      val dir = s"$root/race"
      MetaLog.commit(dir, StreamState.empty, Seq(CreateStream(2L, 1, 1, -1L)))
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration._
      implicit val ec: ExecutionContext = ExecutionContext.global
      val writers = (0 until 6).map { w => Future {
        (0 until 8).foreach { i =>
          MetaLog.commitWithRetry(dir, maxAttempts = 200) { _ => Seq(KvPut(s"w$w-$i", "x")) }
        }
      }}
      Await.result(Future.sequence(writers), 2.minutes)
      val st = MetaLog.load(dir)
      assert(st.kv.size == 48, st.kv.size.toString)
      assert(st.version == 48L, st.version.toString)
    }
  }
}

class FsLogStoreContractSpec extends LogStoreContractSpec {
  def storeName = "FsLogStore"
  def freshStore(): (LogStore, String) =
    (FsLogStore, Files.createTempDirectory("lsc-fs-").toString)
}

class ObjectLogStoreContractSpec extends LogStoreContractSpec {
  def storeName = "ObjectLogStore"
  def freshStore(): (LogStore, String) =
    (new ObjectLogStore(new InMemoryObjectStore), "/mem/lsc")

  test("ObjectLogStore: duplicate-PUT race — loser retries onto the next version") {
    val inner = new InMemoryObjectStore
    val store = new ObjectLogStore(inner)
    val prev = MetaLog.store
    MetaLog.store = store
    try {
      val dir = "/mem/dup/stream"
      MetaLog.commit(dir, StreamState.empty, Seq(CreateStream(3L, 1, 1, -1L)))
      // inject a competing writer that lands the SAME version file right
      // before our conditional PUT decides — the classic commit race
      var injected = false
      inner.beforeConditionalPut = { key =>
        if (!injected && key.endsWith("00000000000000000001.json")) {
          injected = true
          inner.put(key,
            """[{"action":"kvPut","key":"racer","value":"won"}]""".getBytes)
        }
      }
      MetaLog.commitWithRetry(dir) { _ => Seq(KvPut("me", "too")) }
      val st = MetaLog.load(dir)
      // both writers' actions land, on distinct versions, nothing lost
      assert(st.kv == Map("racer" -> "won", "me" -> "too"), st.kv.toString)
      assert(st.version == 2L, st.version.toString)
    } finally MetaLog.store = prev
  }
}
