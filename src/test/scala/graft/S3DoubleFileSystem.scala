package graft

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, OutputStream}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import graft.meta.InMemoryObjectStore

/** Hadoop `FileSystem` double with S3 semantics (`s3double://bucket/key`),
  * backed by the same [[graft.meta.InMemoryObjectStore]] the ObjectLogStore
  * contract runs against — so [[graft.meta.HadoopLogStore]] can be driven
  * through its REAL code paths against a store that behaves like S3:
  *
  *  - `create(path, overwrite = false)` is the racy pre-conditional-write
  *    S3A shape: a HEAD existence probe, then an unconditional PUT at
  *    close() — with an injectable hook ([[S3DoubleFileSystem.betweenHeadAndPut]])
  *    in the window between them, so the lost-update race is reproducible
  *    deterministically instead of probabilistically.
  *  - `createFile(path).overwrite(false).must(FS_OPTION_CREATE_CONDITIONAL_OVERWRITE,
  *    false).build()` (HADOOP-19256) is the conditional path: the
  *    create-if-absent decision happens atomically INSIDE the store
  *    (`If-None-Match: *`), and the losing writer gets
  *    FileAlreadyExistsException at close() — S3's 412.
  *  - directories are virtual (prefixes); `mkdirs` is a no-op; LIST is
  *    immediate children by prefix + delimiter.
  *
  * Buckets are process-global and keyed by authority, so each test gets
  * isolation by minting a fresh bucket name.
  */
class S3DoubleFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var store: InMemoryObjectStore = _
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    store = S3DoubleFileSystem.bucket(name.getAuthority)
  }

  override def getScheme: String = "s3double"
  override def getUri: URI = fsUri

  private def key(f: Path): String =
    f.toUri.getPath.stripPrefix("/").stripSuffix("/")

  private def childPrefix(k: String): String = if (k.isEmpty) "" else k + "/"

  // ---- reads ----

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.get(key(f))
      .getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new S3DoubleFileSystem.SeekableBytes(bytes))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    store.get(k) match {
      case Some(b) => new FileStatus(b.length.toLong, false, 1, 4096L, 0L, makeQualified(f))
      case None =>
        if (k.isEmpty || store.listChildren(childPrefix(k)).nonEmpty)
          new FileStatus(0L, true, 1, 4096L, 0L, makeQualified(f))
        else throw new FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (store.head(k)) return Array(getFileStatus(f))
    val kids = store.listChildren(childPrefix(k))
    if (kids.isEmpty && k.nonEmpty) throw new FileNotFoundException(f.toString)
    kids.map(name => getFileStatus(new Path(f, name))).toArray
  }

  // ---- writes ----

  /** The racy path: HEAD, injectable window, then unconditional PUT at
    * close — exactly what S3A does for overwrite=false WITHOUT conditional
    * writes. */
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && store.head(k)) throw new FileAlreadyExistsException(f.toString)
    if (!overwrite) S3DoubleFileSystem.betweenHeadAndPut(k)
    outStream(k, conditional = false)
  }

  /** The conditional path target: PUT with If-None-Match at close. */
  private[graft] def outStream(k: String, conditional: Boolean): FSDataOutputStream = {
    val s = store
    val sink = new OutputStream {
      private val buf = new ByteArrayOutputStream()
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit =
        if (conditional) {
          if (!s.putIfNoneMatch(k, buf.toByteArray))
            throw new FileAlreadyExistsException(s"PUT $k: 412 PreconditionFailed (If-None-Match: *)")
        } else s.put(k, buf.toByteArray)
    }
    new FSDataOutputStream(sink, null)
  }

  override def createFile(path: Path): FSDataOutputStreamBuilder[_, _] =
    new S3DoubleFileSystem.Builder(this, path)

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("append: object stores are immutable")

  override def rename(src: Path, dst: Path): Boolean = {
    val (ks, kd) = (key(src), key(dst))
    store.get(ks) match {
      case Some(b) => store.put(kd, b); store.delete(ks); true
      case None =>
        val kids = store.listChildren(childPrefix(ks))
        if (kids.isEmpty) false
        else { kids.foreach(c => rename(new Path(src, c), new Path(dst, c))); true }
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (store.head(k)) { store.delete(k); true }
    else {
      val kids = store.listChildren(childPrefix(k))
      if (kids.isEmpty) false
      else if (!recursive) throw new IOException(s"$f: non-empty directory")
      else { kids.foreach(c => delete(new Path(f, c), recursive = true)); true }
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = true // keyspace is flat
  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }
  override def getWorkingDirectory: Path = wd
}

object S3DoubleFileSystem {
  private val buckets =
    new java.util.concurrent.ConcurrentHashMap[String, InMemoryObjectStore]()

  /** The store behind `s3double://<name>/` — for direct injection/assertion. */
  def bucket(name: String): InMemoryObjectStore =
    buckets.computeIfAbsent(name, _ => new InMemoryObjectStore)

  /** Fault-injection hook: runs between the racy create's HEAD probe and its
    * PUT — the window where a competing writer's PUT is silently overwritten
    * when conditional writes are off. */
  @volatile var betweenHeadAndPut: String => Unit = _ => ()

  private final class SeekableBytes(bytes: Array[Byte]) extends FSInputStream {
    private var pos = 0
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new java.io.EOFException(s"seek $p")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int =
      if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (pos >= bytes.length) -1
      else {
        val n = math.min(len, bytes.length - pos)
        System.arraycopy(bytes, pos, b, off, n); pos += n; n
      }
  }

  /** Builder accepting the HADOOP-19256 conditional-create mandatory key
    * (a builder that does NOT know the key must reject it at build() — the
    * default FileSystem builder does, which is what makes the HadoopLogStore
    * conditional path fail loud instead of silently racing on an
    * unsupporting filesystem). */
  final class Builder(dfs: S3DoubleFileSystem, p: Path)
      extends FSDataOutputStreamBuilder[FSDataOutputStream, Builder](dfs, p) {
    override def getThisBuilder: Builder = this
    override def build(): FSDataOutputStream = {
      val condKey = Options.CreateFileOptionKeys.FS_OPTION_CREATE_CONDITIONAL_OVERWRITE
      val known = new java.util.HashSet[java.lang.String]()
      known.add(condKey)
      rejectUnknownMandatoryKeys(known, " for s3double")
      val overwrite = getFlags.contains(CreateFlag.OVERWRITE)
      if (getMandatoryKeys.contains(condKey) || getOptions.get(condKey) != null) {
        // conditional: the VALUE mirrors the overwrite decision, enforced by
        // the store — false => If-None-Match:* (create iff absent)
        if (getOptions.getBoolean(condKey, overwrite))
          dfs.outStream(dfs.key(p), conditional = false)
        else dfs.outStream(dfs.key(p), conditional = true)
      } else {
        dfs.create(p, FsPermission.getFileDefault, overwrite, getBufferSize,
          getReplication, getBlockSize, getProgress)
      }
    }
  }
}
