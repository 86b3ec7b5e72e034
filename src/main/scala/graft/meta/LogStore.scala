package graft.meta

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Storage seam for the metadata log — the complete set of IO primitives
  * [[MetaLog]] needs, so porting the log to an object store is a new
  * implementation of this trait, not surgery on the log logic. Paths are
  * STRINGS (a local path, a Hadoop URI, or an object key) so the seam is
  * scheme-agnostic; each implementation interprets them natively.
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
  def read(path: String): Array[Byte]
  def exists(path: String): Boolean
  def isDir(path: String): Boolean
  def list(dir: String): Seq[String]
  /** Create `path` with `bytes` iff it does not exist; false if it does. */
  def putIfAbsent(path: String, bytes: Array[Byte]): Boolean
  /** Write `path` atomically, replacing any existing content. */
  def putAtomic(path: String, bytes: Array[Byte]): Unit
  def mkdirs(path: String): Unit
  def delete(path: String): Unit
}

/** Local-filesystem LogStore: hard-link creation is the atomic
  * create-if-absent, ATOMIC_MOVE the atomic replace. */
object FsLogStore extends LogStore {
  override def read(path: String): Array[Byte] = Files.readAllBytes(Paths.get(path))
  override def exists(path: String): Boolean = Files.isRegularFile(Paths.get(path))
  override def isDir(path: String): Boolean = Files.isDirectory(Paths.get(path))

  override def list(dir: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) return Seq.empty
    val s = Files.list(d)
    try s.iterator().asScala.map(_.getFileName.toString).toSeq
    finally s.close()
  }

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val p = Paths.get(path)
    val tmp = Files.createTempFile(p.getParent, "_tmp-", ".tmp")
    try {
      Files.write(tmp, bytes)
      try { Files.createLink(p, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def putAtomic(path: String, bytes: Array[Byte]): Unit = {
    val p = Paths.get(path)
    val tmp = Files.createTempFile(p.getParent, "_tmp-", ".tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  override def mkdirs(path: String): Unit = { Files.createDirectories(Paths.get(path)); () }
  override def delete(path: String): Unit = { Files.deleteIfExists(Paths.get(path)); () }
}

/** LogStore over the Hadoop FileSystem API: the metadata log on any
  * Hadoop-addressable URI (`hdfs://`, `s3a://`, `abfs://`, `file:/`).
  *
  * CAS caveat, stated plainly: by default [[putIfAbsent]] maps to
  * `FileSystem.create(path, overwrite = false)`, which is atomic on HDFS and
  * ABFS but on S3A is a racy HEAD-then-PUT — the CAS guarantee is lost.
  * Setting [[HadoopLogStore.ConditionalCreateKey]] `= true` in the Hadoop
  * configuration switches [[putIfAbsent]] to the `createFile()` builder with
  * `fs.option.create.conditional.overwrite` (HADOOP-19256, Hadoop 3.4.1+):
  * the filesystem issues the PUT with `If-None-Match: *` and the
  * create-if-absent decision moves INTO the store, surfacing a conflict at
  * `close()` — exactly one concurrent creator ever succeeds, the same
  * guarantee [[ObjectLogStore]] gets from a native conditional-PUT client.
  * Set it for any `s3a://` stream dir; HDFS/ABFS/local don't need it.
  * [[putAtomic]] is only used for advisory checkpoint artifacts, so
  * create-with-overwrite suffices (readers of a torn checkpoint fall back to
  * folding deltas). */
final class HadoopLogStore(confProvider: () => org.apache.hadoop.conf.Configuration)
    extends LogStore {
  def this(conf: org.apache.hadoop.conf.Configuration) = this(() => conf)
  private def hp(s: String) = new org.apache.hadoop.fs.Path(s)
  private def fs(s: String) = hp(s).getFileSystem(confProvider())

  override def read(path: String): Array[Byte] = {
    val in = fs(path).open(hp(path))
    try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
  }
  override def exists(path: String): Boolean =
    try fs(path).getFileStatus(hp(path)).isFile
    catch { case _: java.io.FileNotFoundException => false }
  override def isDir(path: String): Boolean =
    try fs(path).getFileStatus(hp(path)).isDirectory
    catch { case _: java.io.FileNotFoundException => false }
  override def list(dir: String): Seq[String] =
    try fs(dir).listStatus(hp(dir)).toSeq.map(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    try {
      val out =
        if (confProvider().getBoolean(HadoopLogStore.ConditionalCreateKey, false))
          // conditional create (HADOOP-19256): `must(..CONDITIONAL_OVERWRITE,
          // false)` = "overwrite=false, ENFORCED BY THE STORE" — S3A adds
          // `If-None-Match: *` to the PUT, so the create-if-absent decision
          // is atomic at the store and the losing writer fails (HTTP 412) at
          // close(). A filesystem without conditional support rejects the
          // mandatory key at build() — loud, never silently racy.
          fs(path).createFile(hp(path)).overwrite(false)
            .must(org.apache.hadoop.fs.Options.CreateFileOptionKeys
              .FS_OPTION_CREATE_CONDITIONAL_OVERWRITE, false)
            .build()
        else fs(path).create(hp(path), false)
      try out.write(bytes) finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
      case e: org.apache.hadoop.fs.PathIOException if e.getMessage != null &&
        (e.getMessage.contains("412") || e.getMessage.contains("PreconditionFailed") ||
         e.getMessage.contains("Precondition Failed")) => false
      case e: java.io.IOException if e.getMessage != null &&
        e.getMessage.contains("already exists") => false
    }
  override def putAtomic(path: String, bytes: Array[Byte]): Unit = {
    val out = fs(path).create(hp(path), true)
    try out.write(bytes) finally out.close()
  }
  override def mkdirs(path: String): Unit = { fs(path).mkdirs(hp(path)); () }
  override def delete(path: String): Unit = { fs(path).delete(hp(path), false); () }
}

object HadoopLogStore {
  /** Hadoop-configuration flag: when true, [[HadoopLogStore.putIfAbsent]]
    * uses the HADOOP-19256 conditional-create builder (`If-None-Match: *` on
    * S3A, Hadoop 3.4.1+) instead of `create(path, overwrite = false)` —
    * REQUIRED for the CAS guarantee on `s3a://` stream dirs, where the plain
    * create is a racy HEAD-then-PUT. Off by default: HDFS/ABFS/local creates
    * are already atomic and don't understand the option.
    *
    * Verification status: the builder semantics (`must(..CONDITIONAL_OVERWRITE,
    * false)` ⇒ enforced create-if-absent) are validated against this repo's
    * S3-semantics FileSystem double, which is authored to the HADOOP-19256
    * spec — hadoop-aws is not on this classpath, so the interpretation has
    * NOT been cross-checked against a real S3AFileSystem. Before relying on
    * s3a:// commit safety, run the LogStore contract suite against a real
    * endpoint (or diff this path against the hadoop-aws CreateFileBuilder of
    * the deployed Hadoop version); if real S3A gates the conditional PUT
    * differently, this path would silently keep the racy HEAD-then-PUT. */
  val ConditionalCreateKey = "graft.eslog.log.conditional.create"
}
