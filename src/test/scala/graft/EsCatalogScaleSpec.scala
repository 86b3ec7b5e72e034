package graft

import java.nio.file.Files

import graft.eslog.EsCatalog
import graft.meta._

/** [[ObjectStore]] wrapper adding a fixed per-operation latency — the
  * object-store regime (every GET/HEAD/LIST/PUT is a ~ms network round
  * trip), where the catalog's parallel-sweep claim actually lives. */
final class LatencyStore(inner: InMemoryObjectStore, nanos: Long) extends ObjectStore {
  private def lag(): Unit = java.util.concurrent.locks.LockSupport.parkNanos(nanos)
  override def get(key: String): Option[Array[Byte]] = { lag(); inner.get(key) }
  override def head(key: String): Boolean = { lag(); inner.head(key) }
  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    lag(); inner.putIfNoneMatch(key, bytes)
  }
  override def put(key: String, bytes: Array[Byte]): Unit = { lag(); inner.put(key, bytes) }
  override def listChildren(prefix: String): Seq[String] = { lag(); inner.listChildren(prefix) }
  override def delete(key: String): Unit = { lag(); inner.delete(key) }
}

/** The catalog's 10⁴-stream claim, measured in the regime it is ABOUT: with
  * per-op latency (an object store's ms round trips), [[EsCatalog.listStreams]]'s
  * bounded-parallel sweep must approach sum/threads, not the serial sum of
  * 10k independent log loads. (On a warm local FS a load is ~40µs of
  * syscalls and this container serializes them — parallel ≈ serial there,
  * measured while building this spec; that regime needs no parallelism,
  * 10k loads cost 0.4 s flat.) Setup registers 10,000 streams through the
  * same log commits `createStream` makes, batched.
  */
class EsCatalogScaleSpec extends SparkTestBase {

  private val N = 10000
  private val Sample = 400
  private val OpNanos = 1000000L // 1 ms per store op

  test(s"listStreams at $N streams: sweep wall-clock ~ sum/threads under per-op latency") {
    val store = new ObjectLogStore(new LatencyStore(new InMemoryObjectStore, OpNanos))
    // a real (empty) temp dir as the root path; all metadata-log IO under it
    // routes to the latency-injected object store
    val root = Files.createTempDirectory("cat-scale-").toString + "/cat"
    MetaLog.route(root, store)
    try {
      val cat = new EsCatalog(root)
      // register N streams in batched commits (the registry createStream
      // builds, without 10k serial CAS round trips of setup time)
      var st = MetaLog.load(root)
      (0 until N).grouped(500).foreach { batch =>
        st = MetaLog.commit(root, st,
          batch.map(i => KvPut(f"stream.s$i%05d", i.toString)))
      }
      // each stream's own log: one CreateStream commit, written in parallel
      locally {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration._
        val pool = java.util.concurrent.Executors.newFixedThreadPool(32)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try Await.result(Future.traverse((0 until N).grouped(100).toList) { c =>
          Future {
            c.foreach { i =>
              MetaLog.commit(cat.streamDir(f"s$i%05d"), StreamState.empty,
                Seq(CreateStream(i.toLong, 1, 1, -1L)))
            }
          }
        }, 5.minutes)
        finally pool.shutdown()
      }

      // the registry itself loads O(1): newest checkpoint + <= interval
      // deltas — a handful of store ops, never a fold over all commits
      val t0 = System.nanoTime()
      val reg = MetaLog.load(root)
      val regLoadMs = (System.nanoTime() - t0) / 1e6
      assert(reg.kv.size == N)
      assert(regLoadMs < 2000, f"registry load took $regLoadMs%.0f ms")

      // serial cost, measured over a sample and extrapolated: each load is
      // a fixed number of latency-bound ops, so the extrapolation is linear
      val tS = System.nanoTime()
      (0 until Sample).foreach(i => MetaLog.load(cat.streamDir(f"s$i%05d")))
      val serialEstSec = (System.nanoTime() - tS) / 1e9 * N / Sample

      spark.range(1).count() // lazy-session warmup stays out of the timing
      val tP = System.nanoTime()
      val rows = cat.listStreams(spark).collect()
      val parSec = (System.nanoTime() - tP) / 1e9

      assert(rows.length == N, s"expected $N rows, got ${rows.length}")
      assert(rows.forall(r => !r.getBoolean(5) && r.getLong(4) == 0L))
      // the claim, with generous slack for a shared host: the 32-thread
      // sweep must be at least 8x faster than the serial sum of loads
      assert(parSec < serialEstSec / 8,
        f"parallel sweep $parSec%.2f s vs serial(est) $serialEstSec%.2f s — claim broken")
      info(f"N=$N serial(est)=$serialEstSec%.1f s parallel=$parSec%.2f s registry=$regLoadMs%.0f ms")
    } finally MetaLog.unroute(root)
  }
}
