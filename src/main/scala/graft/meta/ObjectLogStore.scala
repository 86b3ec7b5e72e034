package graft.meta

/** The S3-class object-store surface the metadata log needs — a flat,
  * strongly-consistent keyspace with a conditional create. This is the exact
  * API subset modern object stores expose (S3 since 2020 is read-after-write
  * consistent; S3/GCS/ABFS all support `If-None-Match: *` conditional PUT),
  * and it is everything [[ObjectLogStore]] requires: no rename, no append,
  * no POSIX directory semantics.
  *
  * The reference's whole durability path rides its object store the same way
  * (components/object-storage/src/range_offload.rs:41-291 writes immutable
  * objects; pd's etcd supplies the CAS) — here one conditional PUT supplies
  * both immutability and CAS.
  */
trait ObjectStore {
  /** GET: full object bytes, None if absent. */
  def get(key: String): Option[Array[Byte]]
  /** HEAD: existence without a body read. */
  def head(key: String): Boolean
  /** PUT with `If-None-Match: *`: true iff THIS call created the object —
    * exactly one concurrent creator ever succeeds for a key. */
  def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean
  /** Unconditional PUT: atomic replace, last writer wins. */
  def put(key: String, bytes: Array[Byte]): Unit
  /** LIST with prefix + `/` delimiter: immediate child names under `prefix`
    * (objects AND common prefixes, without the trailing delimiter). A listing
    * after a successful PUT must include the key (read-after-write). */
  def listChildren(prefix: String): Seq[String]
  /** DELETE: idempotent, absent key is a no-op. */
  def delete(key: String): Unit
}

/** [[LogStore]] over an [[ObjectStore]]: the metadata log on S3-class
  * storage. Paths map to keys 1:1 (POSIX string form, leading '/' stripped);
  * directories are virtual — `mkdirs` is a no-op and a "directory" exists
  * iff any key lives under its prefix, exactly as object stores behave.
  *
  * The CAS contract ([[LogStore.putIfAbsent]]) translates to the conditional
  * PUT: version file creation succeeds for exactly one writer, making the
  * version number a CAS token with no coordinator — the same role etcd's
  * transactions play for the reference's PD
  * (pd/pkg/server/storage/endpoint/stream.go:21-24).
  */
final class ObjectLogStore(
    val store: ObjectStore,
    multipartThreshold: Int = 16 * 1024 * 1024) extends LogStore {
  private def key(p: String): String = p.stripPrefix("/")

  /** A payload at or above the threshold rides a multipart upload when the
    * backend supports one (S3's single-PUT ceiling is 5 GiB, but real
    * deployments switch far earlier to stream instead of buffering — the
    * reference rolls parts at 16 MiB, range_offload.rs:26). Visibility and
    * CAS semantics are IDENTICAL to the single-PUT path: nothing appears
    * until complete, and `ifNoneMatch` rides the complete call. The regime
    * this serves: large KV payloads and registry checkpoints past ~5×10⁵
    * streams (~30 B/stream, measured in EsCatalogScaleSpec — 10⁴ streams
    * is ~300 KB and stays a single PUT). */
  private def bigPut(k: String, bytes: Array[Byte], ifNoneMatch: Boolean): Boolean =
    store match {
      case mp: ObjectStore with MultipartStore if bytes.length >= multipartThreshold =>
        val w = new MultipartObjectWriter(mp, k,
          partSize = math.max(multipartThreshold, MultipartStore.MinPartBytes))
        // abort on ANY staging/assembly failure — a throw from close()'s
        // tail-part upload or complete would otherwise leak the staged
        // parts (invisible, but billed until a dangling-upload sweep)
        try { w.write(bytes); w.close(ifNoneMatch) }
        catch { case e: Throwable => w.abort(); throw e }
      case _ =>
        if (ifNoneMatch) store.putIfNoneMatch(k, bytes)
        else { store.put(k, bytes); true }
    }

  override def read(path: String): Array[Byte] =
    store.get(key(path)).getOrElse(
      throw new java.nio.file.NoSuchFileException(path))
  override def exists(path: String): Boolean = store.head(key(path))
  override def isDir(path: String): Boolean = store.listChildren(key(path) + "/").nonEmpty
  override def list(dir: String): Seq[String] = store.listChildren(key(dir) + "/")
  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    bigPut(key(path), bytes, ifNoneMatch = true)
  override def putAtomic(path: String, bytes: Array[Byte]): Unit = {
    bigPut(key(path), bytes, ifNoneMatch = false); ()
  }
  override def mkdirs(path: String): Unit = () // keyspace is flat
  override def delete(path: String): Unit = store.delete(key(path))

  /** Reclaim dangling multipart uploads under `prefix` — writers that died
    * between initiate and complete/abort leave invisible staged parts that
    * only an explicit abort (or S3 lifecycle's AbortIncompleteMultipartUpload)
    * frees. Only uploads initiated BEFORE `initiatedBefore` are aborted —
    * the age gate that keeps a sweep from killing a LIVE writer's in-flight
    * upload mid-commit (same grace discipline as vacuum's sweep for
    * replaced data files; pass a cutoff comfortably older than any commit
    * could run). Returns the number of uploads aborted. */
  def abortDanglingUploads(prefix: String,
                           initiatedBefore: Long = Long.MaxValue): Int = store match {
    case mp: ObjectStore with MultipartStore =>
      val ups = mp.listMultipartUploads(key(prefix))
        .filter { case (_, _, at) => at < initiatedBefore }
      ups.foreach { case (k, id, _) => mp.abortMultipart(k, id) }
      ups.size
    case _ => 0
  }
}

/** In-memory [[ObjectStore]] with S3 semantics: strongly consistent
  * read-after-write, atomic `If-None-Match` PUT, list-by-prefix. Serves as
  * the contract-test double (LogStoreContractSpec runs the full MetaLog
  * protocol against it) and as a scratch backend for unit work. The
  * [[beforeConditionalPut]] hook injects a competing writer immediately
  * before a conditional PUT decides — modeling the duplicate-PUT race a real
  * deployment sees when two drivers commit the same log version. */
final class InMemoryObjectStore extends ObjectStore with MultipartStore {
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  @volatile var beforeConditionalPut: String => Unit = _ => ()
  /** Injected immediately before a part upload stages — lets a test kill a
    * writer mid-upload and prove the key stays untouched + reclaimable. */
  @volatile var beforePartUpload: (String, Int) => Unit = (_, _) => ()

  override def get(key: String): Option[Array[Byte]] =
    Option(objects.get(key)).map(_.clone())
  override def head(key: String): Boolean = objects.containsKey(key)
  override def putIfNoneMatch(key: String, bytes: Array[Byte]): Boolean = {
    beforeConditionalPut(key)
    objects.putIfAbsent(key, bytes.clone()) == null
  }
  override def put(key: String, bytes: Array[Byte]): Unit =
    objects.put(key, bytes.clone())
  override def listChildren(prefix: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    objects.tailMap(prefix).keySet.asScala
      .iterator.takeWhile(_.startsWith(prefix))
      .map(_.substring(prefix.length).takeWhile(_ != '/'))
      .filter(_.nonEmpty)
      .distinct.toSeq
  }
  override def delete(key: String): Unit = { objects.remove(key); () }

  // ---- multipart (S3 semantics; staged parts never touch `objects`) ----

  /** uploadId -> (key, initiatedAtMillis, partNumber -> (etag, bytes)).
    * Staged state lives in a separate map so parts are invisible to
    * get/head/list by construction. */
  private val uploads = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Long, java.util.concurrent.ConcurrentHashMap[Int, (String, Array[Byte])])]()
  private val uploadSeq = new java.util.concurrent.atomic.AtomicLong(0)

  override def initiateMultipart(key: String): String = {
    val id = s"upload-${uploadSeq.incrementAndGet()}"
    uploads.put(id, (key, System.currentTimeMillis(),
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Array[Byte])]()))
    id
  }

  override def uploadPart(key: String, uploadId: String,
                          partNumber: Int, bytes: Array[Byte]): String = {
    require(partNumber >= 1 && partNumber <= MultipartStore.MaxParts,
      s"partNumber out of range: $partNumber")
    beforePartUpload(key, partNumber)
    val up = uploads.get(uploadId)
    if (up == null || up._1 != key)
      throw new IllegalStateException(s"NoSuchUpload: $uploadId for $key")
    // etag = content hash, as S3 computes it; re-upload of a partNumber
    // replaces the previous part and invalidates its etag.
    val etag = java.util.Base64.getEncoder.encodeToString(
      java.security.MessageDigest.getInstance("MD5").digest(bytes))
    up._3.put(partNumber, (etag, bytes.clone()))
    etag
  }

  override def completeMultipart(key: String, uploadId: String,
                                 parts: Seq[(Int, String)],
                                 ifNoneMatch: Boolean): Boolean = {
    val up = uploads.get(uploadId)
    if (up == null || up._1 != key)
      throw new IllegalStateException(s"NoSuchUpload: $uploadId for $key")
    require(parts.nonEmpty, "completeMultipart requires at least one part")
    require(parts.map(_._1) == parts.map(_._1).sorted && parts.map(_._1).distinct == parts.map(_._1),
      "parts must be listed in ascending partNumber order without repeats")
    val resolved = parts.map { case (n, etag) =>
      val staged = up._3.get(n)
      if (staged == null || staged._1 != etag)
        throw new IllegalStateException(s"InvalidPart: part $n etag $etag for $key")
      staged._2
    }
    // S3's EntityTooSmall: every listed part but the last must meet the minimum.
    resolved.dropRight(1).zip(parts).foreach { case (b, (n, _)) =>
      if (b.length < MultipartStore.MinPartBytes)
        throw new IllegalStateException(
          s"EntityTooSmall: part $n is ${b.length} B < ${MultipartStore.MinPartBytes}")
    }
    val assembled = new Array[Byte](resolved.map(_.length).sum)
    var pos = 0
    resolved.foreach { b => System.arraycopy(b, 0, assembled, pos, b.length); pos += b.length }
    // assembly decided under the same hook/CAS discipline as single PUT
    val created =
      if (ifNoneMatch) putIfNoneMatch(key, assembled)
      else { put(key, assembled); true }
    // S3: a successful complete consumes the uploadId; a 412 PreconditionFailed
    // (If-None-Match lost) leaves the upload for the caller to abort.
    if (created) uploads.remove(uploadId)
    created
  }

  override def abortMultipart(key: String, uploadId: String): Unit = {
    uploads.remove(uploadId); () // idempotent; unknown id is a no-op
  }

  override def listMultipartUploads(prefix: String): Seq[(String, String, Long)] = {
    import scala.jdk.CollectionConverters._
    uploads.asScala.iterator
      .collect { case (id, (k, at, _)) if k.startsWith(prefix) => (k, id, at) }
      .toSeq.sorted
  }

  /** Bytes currently staged in in-progress uploads (tests: abort reclaims). */
  def stagedBytes: Long = {
    import scala.jdk.CollectionConverters._
    uploads.asScala.valuesIterator
      .flatMap(_._3.asScala.valuesIterator.map(_._2.length.toLong)).sum
  }
}
