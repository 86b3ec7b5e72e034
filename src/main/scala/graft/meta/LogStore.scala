package graft.meta

import java.nio.file.{Files, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Storage seam for the metadata log — the complete set of IO primitives
  * [[MetaLog]] needs, so porting the log to an object store is a new
  * implementation of this trait, not surgery on the log logic.
  *
  * Contract an S3-class implementation must honor:
  *  - [[putIfAbsent]] is the CAS primitive: for a given path it succeeds for
  *    exactly one writer, ever (S3: conditional PUT with `If-None-Match: *`,
  *    which S3 supports natively; the FS impl uses atomic hard-link
  *    creation). This is what makes a log version number a CAS token.
  *  - [[putAtomic]] replaces atomically, last writer wins (S3: plain PUT) —
  *    only used for checkpoint artifacts whose content is a pure function of
  *    the log prefix, so racing writers converge on identical bytes.
  *  - [[list]] returns immediate child names (S3: LIST by prefix with `/`
  *    delimiter). Listings after a successful putIfAbsent must see the key
  *    (S3 has read-after-write consistency since 2020).
  */
trait LogStore {
  def read(path: Path): Array[Byte]
  def exists(path: Path): Boolean
  def isDir(path: Path): Boolean
  def list(dir: Path): Seq[String]
  /** Create `path` with `bytes` iff it does not exist; false if it does. */
  def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean
  /** Write `path` atomically, replacing any existing content. */
  def putAtomic(path: Path, bytes: Array[Byte]): Unit
  def mkdirs(path: Path): Unit
  def delete(path: Path): Unit
}

/** Local-filesystem LogStore: hard-link creation is the atomic
  * create-if-absent, ATOMIC_MOVE the atomic replace. */
object FsLogStore extends LogStore {
  override def read(path: Path): Array[Byte] = Files.readAllBytes(path)
  override def exists(path: Path): Boolean = Files.isRegularFile(path)
  override def isDir(path: Path): Boolean = Files.isDirectory(path)

  override def list(dir: Path): Seq[String] = {
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  override def putIfAbsent(path: Path, bytes: Array[Byte]): Boolean = {
    val tmp = Files.createTempFile(path.getParent, "_tmp-", ".tmp")
    try {
      Files.write(tmp, bytes)
      try { Files.createLink(path, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def putAtomic(path: Path, bytes: Array[Byte]): Unit = {
    val tmp = Files.createTempFile(path.getParent, "_tmp-", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, path, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  override def mkdirs(path: Path): Unit = Files.createDirectories(path)
  override def delete(path: Path): Unit = Files.deleteIfExists(path)
}
