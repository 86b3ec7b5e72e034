package graft

import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Local filesystem registered under the `s3://` scheme that counts every
  * `open()` per path — a deterministic stand-in for "every read of every
  * object is a paid GET round trip". Where [[S3DoubleFileSystem]] doubles
  * S3's *write* semantics (conditional PUT, HEAD/PUT race), this doubles its
  * *read cost model*: HotCacheSpec proves the cache's object-store win by
  * counting round trips removed, not by racing wall clocks (the reference's
  * cache exists for exactly this fixed per-read cost,
  * components/replication/src/stream/cache.rs:10-94).
  *
  * Data lives on the real local disk (`s3:///tmp/...` → `/tmp/...`), so the
  * full Spark parquet write/read path runs unmodified.
  */
class CountingLocalFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "s3"
  override def getUri: URI = CountingLocalFileSystem.Name

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    CountingLocalFileSystem.record(f.toUri.getPath)
    super.open(f, bufferSize)
  }
}

object CountingLocalFileSystem {
  val Name: URI = URI.create("s3:///")

  private val opens = new ConcurrentHashMap[String, AtomicLong]()

  private[graft] def record(path: String): Unit = {
    opens.computeIfAbsent(path, _ => new AtomicLong()).incrementAndGet()
    ()
  }

  def reset(): Unit = opens.clear()

  /** Total `open()` calls against Parquet data files since the last reset
    * (metadata-log JSON reads are excluded — they are the log's cost, not
    * the scan's). */
  def dataFileOpens: Long =
    opens.asScala.collect { case (p, n) if p.endsWith(".parquet") => n.get() }.sum
}
