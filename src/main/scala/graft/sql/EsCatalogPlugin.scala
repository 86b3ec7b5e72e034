package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.eslog.EsCatalog

/** V2 `TableCatalog` plugin — name-based SQL over streams:
  *
  * {{{
  *   spark.sql.catalog.es      = graft.sql.EsCatalogPlugin
  *   spark.sql.catalog.es.root = /data/streams        # the EsCatalog root
  *
  *   SELECT properties['event_type'], count(*) FROM es.default.events GROUP BY 1;
  *   INSERT INTO es.default.events SELECT payload, properties FROM staged;
  *   CREATE TABLE es.default.clicks TBLPROPERTIES ('retention_ms'='86400000');
  *   SHOW TABLES IN es.default;  DROP TABLE es.default.clicks;
  * }}}
  *
  * Delegates to [[graft.eslog.EsCatalog]] (the PD-equivalent registry: CAS
  * id allocation, name reservation, per-stream metadata logs) — every
  * catalog operation is the SAME linearizable commit the programmatic API
  * performs; SQL and code users share one registry. Reads/writes land on
  * the V1 fast paths via [[org.apache.spark.sql.graftshim
  * .EsLogV2FallbackRule]] (manifest-pruned parquet scan, epoch-fenced
  * commit-protocol append), so the catalog identity costs nothing at
  * execution time. Streams are single-namespace (`default`) — the PD has no
  * namespace notion either; stream-specific verbs (TRIM, SEAL, epochs)
  * remain on the parser-injected STREAM DDL ([[GraftSqlParser]]).
  *
  * Table properties on CREATE: `replica`, `ack_count`, `retention_ms`
  * (rpc.fbs:479-492's stream config). The schema is the fixed record-batch
  * relation ([[graft.model.RecordBatchRow]]); a CREATE may omit columns or
  * restate them exactly.
  */
class EsCatalogPlugin extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var cat: EsCatalog = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val root = options.get("root")
    require(root != null && root.nonEmpty,
      s"spark.sql.catalog.$name.root must point at the catalog root directory")
    cat = new EsCatalog(root)
  }

  override def name(): String = catName
  override def defaultNamespace(): Array[String] = Array("default")

  private def checkNs(ns: Array[String]): Unit =
    if (!(ns.isEmpty || ns.sameElements(Array("default"))))
      throw new NoSuchNamespaceException(ns.toSeq)

  // ---- namespaces (single flat "default", like the PD's keyspace) ----

  override def listNamespaces(): Array[Array[String]] = Array(Array("default"))
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    checkNs(namespace)
    if (namespace.isEmpty) Array(Array("default")) else Array.empty
  }
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || namespace.sameElements(Array("default"))
  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    checkNs(namespace)
    util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "eslog catalog has a single fixed namespace 'default'")
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("eslog namespaces are immutable")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "eslog catalog has a single fixed namespace 'default'")

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    checkNs(namespace)
    cat.streamNames().map(n => Identifier.of(Array("default"), n)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    checkNs(ident.namespace)
    cat.getStream(ident.name) match {
      case Some(id) =>
        org.apache.spark.sql.graftshim.EsLogV2Table(
          s"$catName.default.${ident.name}", cat.streamDir(ident.name), id)
      case None => throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    }
  }

  /** `SELECT * FROM es.default.s VERSION AS OF 3` — the standard-syntax twin
    * of `graft_scan('dir', 3)`: the returned table pins the manifest
    * snapshot at metadata-log version `version`
    * ([[graft.eslog.EsLog.fetchAt]]'s read, routed through the V1 fallback
    * with the provider's `asOfVersion` option). Unknown versions fail loudly
    * with the valid range — the log's versions are the contiguous CAS
    * sequence 0..latest. */
  override def loadTable(ident: Identifier, version: String): Table = {
    checkNs(ident.namespace)
    cat.getStream(ident.name) match {
      case Some(id) =>
        val dir = cat.streamDir(ident.name)
        val v =
          try version.toLong
          catch { case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"eslog VERSION AS OF takes a numeric metadata-log version, got '$version'")
          }
        val latest = graft.meta.MetaLog.latestVersion(dir)
        if (v < 0 || v > latest) throw new IllegalArgumentException(
          s"unknown version $v for $catName.default.${ident.name}: the " +
            s"metadata log holds versions 0..$latest")
        org.apache.spark.sql.graftshim.EsLogV2Table(
          s"$catName.default.${ident.name}", dir, id, asOfVersion = Some(v))
      case None => throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    }
  }

  /** `SELECT * FROM es.default.s TIMESTAMP AS OF '...'` — Spark hands the
    * timestamp as MICROSECONDS since epoch; it resolves to the newest
    * snapshot none of whose records carries a later timestamp
    * ([[graft.eslog.EsLog.versionForTimestamp]] — record-time, the same
    * clock as the time index behind fetchByTime/offsetForTimestamp, since
    * the metadata log records no wall clock). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    checkNs(ident.namespace)
    cat.getStream(ident.name) match {
      case Some(id) =>
        val dir = cat.streamDir(ident.name)
        val v = graft.eslog.EsLog.versionForTimestamp(dir, timestamp / 1000L)
        org.apache.spark.sql.graftshim.EsLogV2Table(
          s"$catName.default.${ident.name}", dir, id, asOfVersion = Some(v))
      case None => throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    }
  }

  override def tableExists(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      cat.getStream(ident.name).isDefined

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    createTable(ident, StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(c.name, c.dataType, c.nullable))),
      partitions, properties)

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    checkNs(ident.namespace)
    require(partitions.isEmpty,
      "eslog streams are not partitioned tables (offset order IS the layout)")
    // the relation schema is fixed; a CREATE may omit it or restate exactly
    // — NAMES (case-insensitive) and TYPES both, else the user's declared
    // types would be silently discarded
    val want = graft.model.RecordBatchRow.schema
      .map(f => (f.name.toLowerCase, f.dataType))
    val got = schema.map(f => (f.name.toLowerCase, f.dataType))
    require(got.isEmpty || got == want,
      "eslog tables have the fixed record-batch schema " +
        s"(${want.map { case (n, t) => s"$n ${t.simpleString}" }.mkString(", ")}); " +
        "omit the column list or restate it exactly")
    val props = properties.asScala
    if (tableExists(ident)) throw new TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    val (_, created) = cat.createStreamIfAbsent(ident.name,
      replica = props.get("replica").map(_.toInt).getOrElse(1),
      ackCount = props.get("ack_count").map(_.toInt).getOrElse(1),
      retentionMs = props.get("retention_ms").map(_.toLong).getOrElse(-1L))
    if (!created) throw new TableAlreadyExistsException((ident.namespace :+ ident.name).toSeq)
    loadTable(ident)
  }

  /** `ALTER TABLE es.default.s SET TBLPROPERTIES(...)` IS UPDATE_STREAM
    * (`pd/pkg/server/cluster/stream.go:79-96` — the PD's UpdateStream
    * patches exactly replica/ack/retention): the three stream-config
    * properties map onto [[graft.eslog.EsLog.update]]'s linearizable
    * metadata commit, same as the parser-injected `ALTER STREAM ... SET`.
    * `UNSET ('retention_ms')` restores the infinite-retention default
    * (-1 — [[graft.eslog.EsLog.create]]'s `retentionMs = -1L`, the repo's
    * MetaLog convention: trim-by-retention is skipped when < 0). Anything
    * else —
    * column changes, renames, other properties — throws: the record-batch
    * schema is fixed and a silently-ignored property would lie to the
    * user. */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    checkNs(ident.namespace)
    if (!tableExists(ident))
      throw new NoSuchTableException((ident.namespace :+ ident.name).toSeq)
    var replica: Option[Int] = None
    var ack: Option[Int] = None
    var retention: Option[Long] = None
    // parse failures carry the property name + expected type — a bare
    // NumberFormatException from `"abc".toInt` gives the SQL user nothing
    def numeric[A](prop: String, value: String, kind: String)(parse: String => A): A =
      try parse(value)
      catch { case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"eslog table property '$prop' expects $kind, got '$value'")
      }
    changes.foreach {
      case s: TableChange.SetProperty => s.property match {
        case "replica" => replica = Some(numeric("replica", s.value, "an INT")(_.toInt))
        case "ack_count" => ack = Some(numeric("ack_count", s.value, "an INT")(_.toInt))
        case "retention_ms" =>
          retention = Some(numeric("retention_ms", s.value, "a BIGINT (millis)")(_.toLong))
        case other => throw new UnsupportedOperationException(
          s"unknown eslog table property '$other' — ALTER TABLE SET " +
            "TBLPROPERTIES supports replica, ack_count, retention_ms " +
            "(UPDATE_STREAM's config surface)")
      }
      case r: TableChange.RemoveProperty if r.property == "retention_ms" =>
        retention = Some(-1L) // back to unlimited (EsLog.create's default)
      case other => throw new UnsupportedOperationException(
        s"eslog streams have a fixed record-batch schema; only SET/UNSET " +
          s"TBLPROPERTIES(replica|ack_count|retention_ms) is supported, got $other")
    }
    if (replica.isDefined || ack.isDefined || retention.isDefined)
      graft.eslog.EsLog.update(cat.streamDir(ident.name), replica, ack, retention)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    (ident.namespace.isEmpty || ident.namespace.sameElements(Array("default"))) &&
      cat.dropStreamIfExists(ident.name)

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "RENAME is unsupported: a stream's name is its registry reservation " +
        "(consumers address it by name+offset); clone to a new name instead")
}
