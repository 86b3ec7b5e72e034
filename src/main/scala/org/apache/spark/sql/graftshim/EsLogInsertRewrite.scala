package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Row
import org.apache.spark.sql.classic
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** SQL `INSERT INTO` support for eslog tables (`CREATE TABLE ... USING eslog`).
  *
  * An eslog table resolves to the manifest-backed parquet relation for reads;
  * Spark's default analysis would plan an INSERT over it as
  * InsertIntoHadoopFsRelationCommand — raw part files dropped into the stream
  * directory, invisible to every scan because nothing commits them to the
  * manifest. This resolution rule (injected by
  * [[graft.sql.GraftSqlExtensions]]) intercepts the statement and routes the
  * rows through the real append path instead: offset assignment, footer
  * audit, CAS manifest commit — the same protocol
  * `df.write.format("eslog")` uses (the APPEND RPC semantics of the
  * reference's stream_client.rs:70-98, reachable from pure SQL).
  *
  * Sessions without the extensions installed are still protected: the
  * manifest relation's FileFormat refuses `prepareWrite`
  * ([[EsLogReadOnlyParquet]]), so the bypass is loud, never silently lossy.
  */
object EsLogInsertRewrite {
  def rule: Rule[LogicalPlan] = new Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
      case i: InsertIntoStatement if i.query.resolved && eslogDir(i.table).isDefined =>
        require(!i.overwrite,
          "eslog is append-only; INSERT OVERWRITE is unsupported (use TRIM/DELETE_STREAM)")
        require(i.partitionSpec.isEmpty && !i.ifPartitionNotExists,
          "eslog INSERT does not take a PARTITION spec (streams are not partitioned tables)")
        val (dir, table) = eslogDir(i.table).get
        insertCommand(dir, table, i.query, i.userSpecifiedCols)
    }
  }

  /** Shared INSERT validation + command construction — used by the
    * path-addressed rule above and the V2-catalog write shapes
    * ([[EsLogV2FallbackRule]]). */
  private[graftshim] def insertCommand(dir: String, table: Option[String],
                                       query: LogicalPlan,
                                       userSpecifiedCols: Seq[String]): EsLogInsertCommand = {
    // an explicit column list renames the query's output positionally
    // (standard INSERT (cols...) semantics) before the by-name append
    val q =
      if (userSpecifiedCols.isEmpty) query
      else {
        require(userSpecifiedCols.size == query.output.size,
          s"INSERT column list has ${userSpecifiedCols.size} names but the " +
            s"query produces ${query.output.size} columns")
        org.apache.spark.sql.catalyst.plans.logical.Project(
          query.output.zip(userSpecifiedCols).map { case (a, n) =>
            org.apache.spark.sql.catalyst.expressions.Alias(a, n)()
          }, query)
      }
    // rows are matched BY NAME downstream (EsLog.append normalize), which
    // silently defaults absent fields — so reject the silent cases HERE:
    // a query column the append would drop, or a missing payload, is a
    // user mistake that must fail analysis, not commit corrupted rows.
    // Matching is case-insensitive (Spark's default resolution is).
    // Engine-assigned read columns (stream_id, range_index, base_offset)
    // are ACCEPTED and ignored: `INSERT INTO dst SELECT * FROM src`
    // between two eslog tables is well-defined (the append reassigns
    // them), not a mistake.
    val writable = Set("payload", "properties", "base_timestamp",
      "last_offset_delta", "flags")
    val engineAssigned = Set("stream_id", "range_index", "base_offset")
    val names = q.output.map(_.name)
    require(names.exists(_.equalsIgnoreCase("payload")),
      s"eslog INSERT must produce a 'payload' column; got (${names.mkString(", ")}) — " +
        "columns are matched by name, alias your SELECT")
    val unknown = names.filterNot { n =>
      val lc = n.toLowerCase(java.util.Locale.ROOT)
      writable.contains(lc) || engineAssigned.contains(lc)
    }
    require(unknown.isEmpty,
      s"eslog INSERT produced unrecognized column(s) (${unknown.mkString(", ")}); " +
        s"writable columns are (${writable.toSeq.sorted.mkString(", ")}), matched by name")
    EsLogInsertCommand(dir, table, q)
  }

  private def eslogDir(table: LogicalPlan): Option[(String, Option[String])] =
    table match {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation => h.location match {
          case idx: EsLogManifestFileIndex =>
            Some((idx.streamDir, lr.catalogTable.map(_.identifier.quotedString)))
          case _ => None
        }
        case _ => None
      }
      case _ => None
    }
}

/** The rewritten INSERT: evaluate the query, append through the commit
  * protocol at the stream's current epoch. Columns are matched BY NAME
  * (EsLog.append's normalize), so a SELECT must alias its payload column. */
case class EsLogInsertCommand(dir: String, table: Option[String],
                              query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(sparkSession: org.apache.spark.sql.SparkSession): Seq[Row] = {
    val cs = sparkSession.asInstanceOf[classic.SparkSession]
    graft.eslog.EsLog.append(sparkSession, dir, classic.Dataset.ofRows(cs, query),
      epoch = graft.meta.MetaLog.load(dir).epoch)
    // the session catalog caches a resolved data-source relation PER TABLE
    // NAME, and a cached eslog relation pins its manifest SNAPSHOT — refresh
    // so the next read of the table re-resolves against the new commit (the
    // invalidation every transactional table format performs post-write)
    table.foreach(cs.catalog.refreshTable)
    Seq.empty
  }
}
