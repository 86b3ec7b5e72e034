package graft.meta

/** S3 multipart-upload surface — the API the reference's range offload is
  * built on (components/object-storage/src/range_offload.rs:127-291 streams
  * each accumulated range into a multipart object part-by-part and makes it
  * visible only at complete). Semantics modeled exactly on S3:
  *
  *   - `initiate` opens an upload and returns an uploadId; staged parts are
  *     INVISIBLE to get/head/list until complete.
  *   - `uploadPart` stages bytes under (uploadId, partNumber 1..10000) and
  *     returns an etag; re-uploading a partNumber replaces the part (the new
  *     etag supersedes the old one).
  *   - `completeMultipart` atomically assembles the LISTED parts in
  *     partNumber order into one visible object. Parts staged but not listed
  *     are discarded. Every non-final listed part must be >= 5 MiB
  *     (EntityTooSmall is raised at complete time, as S3 does). A stale etag
  *     or unknown partNumber fails the complete. With `ifNoneMatch` the
  *     complete carries `If-None-Match: *`: exactly one concurrent creator
  *     of the key succeeds — CAS at assembly time, which is what makes a
  *     multipart metadata-log commit as safe as the single-PUT path.
  *   - `abortMultipart` discards all staged parts; idempotent. Dangling
  *     uploads (writer died before complete/abort) are enumerable via
  *     `listMultipartUploads` so a vacuum sweep can reclaim them — the role
  *     S3 lifecycle's AbortIncompleteMultipartUpload plays.
  */
trait MultipartStore { self: ObjectStore =>
  def initiateMultipart(key: String): String
  /** Stage bytes as part `partNumber` (1-based) of `uploadId`; returns the
    * part's etag. Throws if the upload is unknown (completed/aborted). */
  def uploadPart(key: String, uploadId: String, partNumber: Int, bytes: Array[Byte]): String
  /** Atomically assemble the listed (partNumber, etag) parts, in partNumber
    * order, into the visible object. Returns true iff the object was
    * written by THIS call (always true when `ifNoneMatch` is false;
    * create-only when true). The uploadId is consumed either way. */
  def completeMultipart(key: String, uploadId: String, parts: Seq[(Int, String)],
                        ifNoneMatch: Boolean = false): Boolean
  def abortMultipart(key: String, uploadId: String): Unit
  /** In-progress uploads under `prefix` as (key, uploadId, initiatedAtMillis)
    * — the initiation time is what S3's ListMultipartUploads returns as
    * `Initiated`, and what lets a sweep distinguish a DANGLING upload (dead
    * writer) from a live in-flight one. */
  def listMultipartUploads(prefix: String): Seq[(String, String, Long)]
}

object MultipartStore {
  /** S3's minimum size for every non-final part. */
  val MinPartBytes: Int = 5 * 1024 * 1024
  /** S3's maximum part count per upload. */
  val MaxParts: Int = 10000
}

/** Streaming writer over a [[MultipartStore]] — the Spark-side shape of the
  * reference's `MultiPartObject` write loop (range_offload.rs:127-291):
  * bytes accumulate in a buffer that rolls into an uploaded part each time it
  * reaches `partSize`, and `close()` assembles the object. Two deliberate
  * policy matches with the reference:
  *
  *   - An object whose total size never reaches one part is written with a
  *     single PUT instead of initiate/upload/complete — the API-call saving
  *     the reference's write loop notes as its delayed-init TODO, and the
  *     only legal shape anyway when the total is under S3's 5 MiB part
  *     minimum.
  *   - Nothing is visible until `close()` returns: readers see the object
  *     all-or-nothing, which is what lets a commit protocol treat "object
  *     exists" as "object complete".
  *
  * `close(ifNoneMatch = true)` makes the final assembly a conditional
  * create, so a multipart-sized metadata-log version file keeps the
  * exactly-one-winner CAS guarantee of [[LogStore.putIfAbsent]].
  * On any staging failure the caller should `abort()` — staged parts are
  * reclaimed and the key is untouched.
  */
final class MultipartObjectWriter(
    store: ObjectStore with MultipartStore,
    key: String,
    partSize: Int = 16 * 1024 * 1024) {
  require(partSize >= MultipartStore.MinPartBytes,
    s"partSize must be >= S3 min part (${MultipartStore.MinPartBytes}); got $partSize")

  private val buf = new java.io.ByteArrayOutputStream(64 * 1024)
  private var uploadId: Option[String] = None
  private var parts: List[(Int, String)] = Nil
  private var nextPart = 1
  private var closed = false

  /** Full parts are sliced straight out of the incoming array — the buffer
    * only ever holds a sub-part tail (< partSize), so a large single write
    * costs one copy per part and peak extra memory of one part, not the
    * O(N²/partSize) re-copying a buffer-then-split shape would pay on the
    * exact hot path (multi-part catalog checkpoints at ingest rates). */
  def write(bytes: Array[Byte]): Unit = {
    require(!closed, s"writer for $key is closed")
    var off = 0
    if (buf.size > 0) { // top up the buffered tail to a full part first
      val take = math.min(partSize - buf.size, bytes.length)
      buf.write(bytes, 0, take)
      off = take
      if (buf.size == partSize) {
        uploadPartBytes(buf.toByteArray)
        buf.reset()
      }
    }
    while (bytes.length - off >= partSize) { // whole parts, no buffering
      uploadPartBytes(java.util.Arrays.copyOfRange(bytes, off, off + partSize))
      off += partSize
    }
    if (off < bytes.length) buf.write(bytes, off, bytes.length - off)
  }

  private def uploadPartBytes(part: Array[Byte]): Unit = {
    val id = uploadId.getOrElse {
      val i = store.initiateMultipart(key); uploadId = Some(i); i
    }
    require(nextPart <= MultipartStore.MaxParts,
      s"$key exceeds ${MultipartStore.MaxParts} parts at partSize=$partSize")
    val etag = store.uploadPart(key, id, nextPart, part)
    parts = (nextPart, etag) :: parts
    nextPart += 1
  }

  /** Upload any tail bytes as the final (possibly short) part and assemble.
    * Returns true iff the object was created by this writer (false only when
    * `ifNoneMatch` and another writer won the key). */
  def close(ifNoneMatch: Boolean = false): Boolean = {
    require(!closed, s"writer for $key already closed")
    closed = true
    uploadId match {
      case None => // total < one part: single PUT saves three API calls
        if (ifNoneMatch) store.putIfNoneMatch(key, buf.toByteArray)
        else { store.put(key, buf.toByteArray); true }
      case Some(id) =>
        if (buf.size > 0) uploadPartBytes(buf.toByteArray)
        val created = store.completeMultipart(key, id, parts.reverse, ifNoneMatch)
        // a lost conditional complete leaves the upload staged (S3's 412
        // behavior) — reclaim it; the winner's object is untouched
        if (!created) store.abortMultipart(key, id)
        created
    }
  }

  /** Discard staged parts and release the uploadId; key untouched. */
  def abort(): Unit = {
    closed = true
    uploadId.foreach(store.abortMultipart(key, _))
    uploadId = None
  }

  /** Parts uploaded so far (monitoring / tests). */
  def partCount: Int = parts.length
}
