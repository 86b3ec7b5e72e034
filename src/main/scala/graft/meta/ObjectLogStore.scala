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
final class ObjectLogStore(val store: ObjectStore) extends LogStore {
  private def key(p: String): String = p.stripPrefix("/")

  override def read(path: String): Array[Byte] =
    store.get(key(path)).getOrElse(
      throw new java.nio.file.NoSuchFileException(path))
  override def exists(path: String): Boolean = store.head(key(path))
  override def isDir(path: String): Boolean = store.listChildren(key(path) + "/").nonEmpty
  override def list(dir: String): Seq[String] = store.listChildren(key(dir) + "/")
  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean =
    store.putIfNoneMatch(key(path), bytes)
  override def putAtomic(path: String, bytes: Array[Byte]): Unit =
    store.put(key(path), bytes)
  override def mkdirs(path: String): Unit = () // keyspace is flat
  override def delete(path: String): Unit = store.delete(key(path))
}

/** In-memory [[ObjectStore]] with S3 semantics: strongly consistent
  * read-after-write, atomic `If-None-Match` PUT, list-by-prefix. Serves as
  * the contract-test double (LogStoreContractSpec runs the full MetaLog
  * protocol against it) and as a scratch backend for unit work. The
  * [[beforeConditionalPut]] hook injects a competing writer immediately
  * before a conditional PUT decides — modeling the duplicate-PUT race a real
  * deployment sees when two drivers commit the same log version. */
final class InMemoryObjectStore extends ObjectStore {
  private val objects =
    new java.util.concurrent.ConcurrentSkipListMap[String, Array[Byte]]()
  @volatile var beforeConditionalPut: String => Unit = _ => ()

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
}
