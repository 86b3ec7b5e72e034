package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.meta._

/** The multipart-offload seam (reference: the MultiPartObject write loop in
  * components/object-storage/src/range_offload.rs:127-291): S3 multipart
  * semantics on the ObjectStore double, the streaming writer's rolling
  * policy, and the ObjectLogStore threshold wiring — including the
  * conditional-complete CAS that keeps a multipart-sized metadata-log commit
  * exactly-one-winner. */
class MultipartSpec extends AnyFunSuite {

  private val Min = MultipartStore.MinPartBytes

  private def bytes(n: Int, seed: Int): Array[Byte] = {
    val b = new Array[Byte](n)
    var x = seed
    var i = 0
    while (i < n) { x = x * 48271 + 11; b(i) = (x >>> 16).toByte; i += 1 }
    b
  }

  /** Delegating wrapper that counts API calls — proves which path a write
    * took without peeking at internals. */
  private final class Counting(inner: InMemoryObjectStore)
      extends ObjectStore with MultipartStore {
    var puts, condPuts, initiates, partUploads, completes, aborts = 0
    def get(k: String) = inner.get(k)
    def head(k: String) = inner.head(k)
    def putIfNoneMatch(k: String, b: Array[Byte]) = { condPuts += 1; inner.putIfNoneMatch(k, b) }
    def put(k: String, b: Array[Byte]) = { puts += 1; inner.put(k, b) }
    def listChildren(p: String) = inner.listChildren(p)
    def delete(k: String) = inner.delete(k)
    def initiateMultipart(k: String) = { initiates += 1; inner.initiateMultipart(k) }
    def uploadPart(k: String, id: String, n: Int, b: Array[Byte]) =
      { partUploads += 1; inner.uploadPart(k, id, n, b) }
    def completeMultipart(k: String, id: String, parts: Seq[(Int, String)], inm: Boolean) =
      { completes += 1; inner.completeMultipart(k, id, parts, inm) }
    def abortMultipart(k: String, id: String) = { aborts += 1; inner.abortMultipart(k, id) }
    def listMultipartUploads(p: String) = inner.listMultipartUploads(p)
  }

  test("staged parts are invisible until complete; assembly is atomic and ordered") {
    val s = new InMemoryObjectStore
    val id = s.initiateMultipart("a/obj")
    val p1 = bytes(Min, 1); val p2 = bytes(Min, 2); val p3 = bytes(1000, 3)
    // upload out of order — partNumber, not upload order, decides assembly
    val e3 = s.uploadPart("a/obj", id, 3, p3)
    val e1 = s.uploadPart("a/obj", id, 1, p1)
    val e2 = s.uploadPart("a/obj", id, 2, p2)
    assert(!s.head("a/obj") && s.get("a/obj").isEmpty)
    assert(s.listChildren("a/") == Seq.empty)
    assert(s.stagedBytes == p1.length + p2.length + p3.length.toLong)
    assert(s.completeMultipart("a/obj", id, Seq((1, e1), (2, e2), (3, e3))))
    assert(java.util.Arrays.equals(s.get("a/obj").get, p1 ++ p2 ++ p3))
    assert(s.stagedBytes == 0L)
    // uploadId consumed: a second complete fails loudly
    intercept[IllegalStateException] {
      s.completeMultipart("a/obj", id, Seq((1, e1)))
    }
  }

  test("re-upload replaces a part; a stale etag or unknown part fails complete") {
    val s = new InMemoryObjectStore
    val id = s.initiateMultipart("k")
    val stale = s.uploadPart("k", id, 1, bytes(Min, 7))
    val fresh = s.uploadPart("k", id, 1, bytes(Min, 8)) // replaces
    assert(stale != fresh)
    intercept[IllegalStateException] { s.completeMultipart("k", id, Seq((1, stale))) }
    intercept[IllegalStateException] { s.completeMultipart("k", id, Seq((2, fresh))) }
    assert(s.completeMultipart("k", id, Seq((1, fresh))))
    assert(java.util.Arrays.equals(s.get("k").get, bytes(Min, 8)))
  }

  test("EntityTooSmall: every non-final listed part must be >= 5 MiB; a short final part is legal") {
    val s = new InMemoryObjectStore
    val id = s.initiateMultipart("k")
    val short = s.uploadPart("k", id, 1, bytes(100, 1))
    val tail  = s.uploadPart("k", id, 2, bytes(100, 2))
    val err = intercept[IllegalStateException] {
      s.completeMultipart("k", id, Seq((1, short), (2, tail)))
    }
    assert(err.getMessage.contains("EntityTooSmall"))
    // single listed part: it IS the final part, any size goes
    assert(s.completeMultipart("k", id, Seq((1, short))))
  }

  test("conditional complete: exactly one winner; loser's upload stays staged until abort") {
    val s = new InMemoryObjectStore
    val idA = s.initiateMultipart("v/000003.json")
    val idB = s.initiateMultipart("v/000003.json")
    val ea = s.uploadPart("v/000003.json", idA, 1, bytes(Min, 100))
    val eb = s.uploadPart("v/000003.json", idB, 1, bytes(Min, 200))
    assert(s.completeMultipart("v/000003.json", idA, Seq((1, ea)), ifNoneMatch = true))
    assert(!s.completeMultipart("v/000003.json", idB, Seq((1, eb)), ifNoneMatch = true))
    // the winner's bytes are untouched by the losing complete
    assert(java.util.Arrays.equals(s.get("v/000003.json").get, bytes(Min, 100)))
    // S3's 412 path: the loser's upload survives for an explicit abort
    assert(s.listMultipartUploads("v/").map(u => (u._1, u._2)) == Seq(("v/000003.json", idB)))
    assert(s.stagedBytes == Min.toLong)
    s.abortMultipart("v/000003.json", idB)
    s.abortMultipart("v/000003.json", idB) // idempotent
    assert(s.stagedBytes == 0L && s.listMultipartUploads("").isEmpty)
  }

  test("writer: small object falls back to one PUT; larger objects roll 16 MiB-style parts") {
    val inner = new InMemoryObjectStore
    val s = new Counting(inner)
    // below one part: exactly one unconditional PUT, zero multipart calls
    val small = new MultipartObjectWriter(s, "small", partSize = Min)
    small.write(bytes(1000, 5))
    assert(small.close())
    assert(s.puts == 1 && s.initiates == 0 && s.partUploads == 0)
    assert(java.util.Arrays.equals(inner.get("small").get, bytes(1000, 5)))

    // 2.4 parts, fed in uneven chunks: rolls exactly at partSize boundaries
    val big = new MultipartObjectWriter(s, "big", partSize = Min)
    val payload = bytes(2 * Min + Min / 2, 9)
    payload.grouped(1 << 20).foreach(big.write)
    assert(big.close())
    assert(s.initiates == 1 && s.partUploads == 3 && s.completes == 1)
    assert(big.partCount == 3) // two rolled full parts + the tail part from close()
    assert(java.util.Arrays.equals(inner.get("big").get, payload))
    assert(inner.stagedBytes == 0L)
  }

  test("writer invariants on random chunkings: byte-exact assembly, no staged residue") {
    val rnd = new scala.util.Random(42)
    val s = new InMemoryObjectStore
    (0 until 20).foreach { i =>
      val total = rnd.nextInt(3 * Min + Min / 2) // 0 .. ~3.5 parts
      val payload = bytes(total, seed = i)
      val w = new MultipartObjectWriter(s, s"rand/$i", partSize = Min)
      // feed in random-sized chunks (incl. empty and part-straddling ones)
      var off = 0
      while (off < total) {
        val n = math.min(total - off, rnd.nextInt(Min + Min / 3 + 1))
        w.write(java.util.Arrays.copyOfRange(payload, off, off + n))
        off += n
      }
      assert(w.close())
      assert(java.util.Arrays.equals(s.get(s"rand/$i").get, payload),
        s"round $i: content mismatch at total=$total")
      assert(w.partCount == (if (total < Min) 0 else (total + Min - 1) / Min),
        s"round $i: partCount=${w.partCount} for total=$total")
    }
    assert(s.stagedBytes == 0L && s.listMultipartUploads("").isEmpty)
  }

  test("writer crash mid-part: abort leaves the key untouched and reclaims staged bytes") {
    val s = new InMemoryObjectStore
    s.beforePartUpload = (_, n) => if (n == 2) throw new RuntimeException("network down")
    val w = new MultipartObjectWriter(s, "crash", partSize = Min)
    intercept[RuntimeException] { w.write(bytes(2 * Min, 3)) }
    w.abort()
    s.beforePartUpload = (_, _) => ()
    assert(!s.head("crash") && s.stagedBytes == 0L && s.listMultipartUploads("").isEmpty)
  }

  test("ObjectLogStore: payloads at the threshold ride multipart; CAS and round trip hold") {
    val inner = new InMemoryObjectStore
    val s = new Counting(inner)
    val log = new ObjectLogStore(s, multipartThreshold = Min)
    val big = bytes(2 * Min + 12345, 17)
    log.putAtomic("/dir/_eslog/checkpoint.json", big)
    assert(s.initiates == 1 && s.partUploads == 3 && s.completes == 1)
    assert(java.util.Arrays.equals(log.read("/dir/_eslog/checkpoint.json"), big))
    // conditional create of a large version file: first writer wins, second loses
    assert(log.putIfAbsent("/dir/_eslog/v7.json", big))
    assert(!log.putIfAbsent("/dir/_eslog/v7.json", bytes(2 * Min, 99)))
    assert(java.util.Arrays.equals(log.read("/dir/_eslog/v7.json"), big))
    // the losing writer's close() aborted its upload — nothing dangles
    assert(inner.stagedBytes == 0L && inner.listMultipartUploads("").isEmpty)
    // small payloads keep the single-call path
    val before = (s.puts, s.condPuts, s.initiates)
    log.putAtomic("/dir/small", bytes(100, 1))
    assert(log.putIfAbsent("/dir/small2", bytes(100, 2)))
    assert(s.initiates == before._3 && s.puts == before._1 + 1 && s.condPuts == before._2 + 1)
  }

  test("dangling-upload vacuum: abortDanglingUploads reclaims dead writers' parts") {
    val inner = new InMemoryObjectStore
    val log = new ObjectLogStore(inner, multipartThreshold = Min)
    // two writers die between initiate and complete
    val id1 = inner.initiateMultipart("s1/_eslog/x"); inner.uploadPart("s1/_eslog/x", id1, 1, bytes(Min, 1))
    val id2 = inner.initiateMultipart("s2/_eslog/y"); inner.uploadPart("s2/_eslog/y", id2, 1, bytes(Min, 2))
    assert(inner.stagedBytes == 2L * Min)
    // the age gate protects LIVE writers: a cutoff earlier than every
    // initiation aborts nothing
    assert(log.abortDanglingUploads("/", initiatedBefore = 0L) == 0)
    assert(inner.stagedBytes == 2L * Min)
    assert(log.abortDanglingUploads("/s1/") == 1) // prefix-scoped
    assert(inner.stagedBytes == Min.toLong)
    assert(log.abortDanglingUploads("/",
      initiatedBefore = System.currentTimeMillis() + 60000) == 1)
    assert(inner.stagedBytes == 0L)
  }

  test("end to end: a multipart-sized MetaLog commit (6 MiB KV value) survives the full protocol") {
    val inner = new InMemoryObjectStore
    val log = new ObjectLogStore(inner, multipartThreshold = Min)
    val dir = "/mp-stream"
    MetaLog.route(dir, log)
    try {
      val fat = new String(Array.tabulate(6 * 1024 * 1024)(i => ('a' + (i * 31 % 26)).toChar))
      var st = MetaLog.commit(dir, StreamState.empty, Seq(CreateStream(1L, 1, 1, -1L)))
      st = MetaLog.commit(dir, st, Seq(KvPut("fat", fat)))
      st = MetaLog.commit(dir, st, Seq(KvPut("thin", "v")))
      val loaded = MetaLog.load(dir)
      assert(loaded.version == st.version)
      assert(loaded.kv("fat") == fat && loaded.kv("thin") == "v")
      assert(inner.stagedBytes == 0L)
    } finally { MetaLog.unroute(dir) }
  }
}
