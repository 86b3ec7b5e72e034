package org.apache.spark.sql.graftshim

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogStorageFormat, CatalogTable, CatalogTableType, CatalogUtils}
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.{Table, TableCapability, V2TableWithV1Fallback}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

/** The DSv2 `Table` a name-addressed stream resolves to through
  * [[graft.sql.EsCatalogPlugin]] (`spark.sql.catalog.es=...` →
  * `SELECT ... FROM es.default.events`).
  *
  * Reads and writes execute on the V1 fast path — the manifest-pruned
  * native parquet relation and the epoch-fenced commit protocol — via
  * [[EsLogV2FallbackRule]], the Delta technique for keeping full pushdown/
  * codegen under a V2 catalog identity. `ACCEPT_ANY_SCHEMA` keeps Spark's
  * positional output resolution out of the way so INSERTs stay BY NAME with
  * [[EsLogInsertRewrite]]'s validation (the same contract as path-addressed
  * `USING eslog` tables). Streaming reads/writes resolve through
  * [[V2TableWithV1Fallback]] to the registered `eslog` source provider. */
final case class EsLogV2Table(ident: String, streamDir: String, streamId: Long,
                              asOfVersion: Option[Long] = None)
    extends Table with V2TableWithV1Fallback {
  override def name(): String =
    asOfVersion.fold(ident)(v => s"$ident@v$v")
  override def schema(): StructType = graft.model.RecordBatchRow.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.ACCEPT_ANY_SCHEMA)
  override def properties(): java.util.Map[String, String] =
    Map("provider" -> "eslog", "location" -> streamDir,
      "stream_id" -> streamId.toString).asJava

  /** The V1 face: a provider-based external table at the stream directory —
    * Spark's streaming resolution (readStream.table / writeStream.toTable)
    * routes through this to the registered `eslog` source. */
  override def v1Table: CatalogTable = CatalogTable(
    // FULLY qualified, catalog part included: UnresolvedCatalogRelation
    // asserts a database part, and the streaming write path refreshes
    // `identifier.quotedString` through the SESSION resolver after every
    // micro-batch (MicroBatchExecution) — without the catalog part that
    // refresh resolves `default.<name>` against the session catalog and
    // dies TABLE_OR_VIEW_NOT_FOUND on the first batch
    identifier = TableIdentifier(ident.split('.').last, Some("default"),
      Some(ident.split('.').head)),
    tableType = CatalogTableType.EXTERNAL,
    storage = CatalogStorageFormat.empty.copy(
      locationUri = Some(CatalogUtils.stringToURI(streamDir)),
      properties = Map("path" -> streamDir)),
    schema = graft.model.RecordBatchRow.schema,
    provider = Some("eslog"))
}

/** Resolution rule (injected by [[graft.sql.GraftSqlExtensions]]) that lands
  * catalog-addressed eslog tables on the V1 execution paths:
  *
  *  - a batch `DataSourceV2Relation` over [[EsLogV2Table]] becomes the
  *    manifest-backed native parquet relation (same attributes, so parent
  *    operators keep their references) — full pushdown, codegen, manifest
  *    `sizeInBytes`;
  *  - `AppendData` (what Spark's ResolveInsertInto makes of `INSERT INTO
  *    es.default.x ...`) becomes [[EsLogInsertCommand]] under
  *    [[EsLogInsertRewrite]]'s by-name validation — offsets assigned by the
  *    commit protocol, never raw files;
  *  - overwrite shapes are rejected loudly (streams are append-only).
  *
  * Top-down so the write shapes are rewritten before their embedded
  * relation would be converted from under them. */
final case class EsLogV2FallbackRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def esTable(p: LogicalPlan): Option[EsLogV2Table] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: EsLogV2Table => Some(t)
      case _ => None
    }
    case _ => None
  }

  private def toV1(r: DataSourceV2Relation, t: EsLogV2Table): LogicalPlan = {
    // a `VERSION AS OF` / `TIMESTAMP AS OF` table (EsCatalogPlugin's
    // loadTable(ident, version/timestamp)) pins the manifest snapshot the
    // V1 relation reads — the provider's existing asOfVersion option, the
    // same read graft_scan('dir', v) performs
    val params = Map("path" -> t.streamDir) ++
      t.asOfVersion.map(v => "asOfVersion" -> v.toString) ++ r.options.asScala
    val base = new graft.sources.EsLogSourceProvider()
      .createRelation(session.sqlContext, params)
    // carry the V1 catalog-table face: Catalog.refreshTable's cache walk
    // reads `catalogTable.get` off every LogicalRelation it meets (the
    // streaming write path refreshes the destination after each
    // micro-batch), and a bare None there is a None.get crash
    LogicalRelation(base, r.output, Some(t.v1Table), isStreaming = false,
      stream = None)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case a: AppendData if esTable(a.table).isDefined && a.query.resolved =>
      val t = esTable(a.table).get
      require(t.asOfVersion.isEmpty,
        s"cannot INSERT into a time-travel snapshot of ${t.ident}: " +
          "VERSION/TIMESTAMP AS OF pins a read-only historical state")
      // table = None: V2-catalog relations resolve FRESH each query (no
      // session-catalog relation cache to invalidate — refreshTable's V2
      // cache walk chokes on a never-cached ident)
      EsLogInsertRewrite.insertCommand(t.streamDir, None, a.query,
        userSpecifiedCols = Nil)
    case o: OverwriteByExpression if esTable(o.table).isDefined =>
      throw new IllegalArgumentException(
        "eslog is append-only; INSERT OVERWRITE is unsupported (use TRIM/DELETE_STREAM)")
    case o: OverwritePartitionsDynamic if esTable(o.table).isDefined =>
      throw new IllegalArgumentException(
        "eslog streams are not partitioned tables; dynamic overwrite is unsupported")
    case r: DataSourceV2Relation if esTable(r).isDefined =>
      toV1(r, esTable(r).get)
  }
}
