package graft.sql

import java.util.regex.Pattern

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.graftshim.GraftProcedureCall
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType}

import graft.eslog.{EsCatalog, EsLog}

/** Real stream-lifecycle DDL — `CREATE STREAM` as a parsed STATEMENT, not a
  * table function (the SQL-surface symmetry the reference's client gets from
  * its admin RPCs, components/replication/src/stream_client.rs:70-98):
  *
  * {{{
  *   CREATE STREAM [IF NOT EXISTS] name IN 'root'
  *          [WITH (retention_ms = 1000, replica = 3, ack_count = 2)]
  *   ALTER STREAM name IN 'root' SET (retention_ms = 2000, ...)
  *   DROP STREAM [IF EXISTS] name IN 'root'
  *   DESCRIBE STREAM name IN 'root'
  *   SHOW STREAMS IN 'root'
  * }}}
  *
  * Injected via `SparkSessionExtensions.injectParser`; anything that does
  * not start with these keywords delegates to Spark's parser untouched, so
  * the full SQL language is unaffected.
  *
  * The side effect is EXECUTION-time, not analysis-time: each statement
  * parses to a [[GraftProcedureCall]] leaf carrying a thunk, planned by
  * [[org.apache.spark.sql.graftshim.GraftProcedureStrategy]] — so `EXPLAIN
  * CREATE STREAM ...` explains without creating, and re-executing the
  * statement re-runs the DDL with real DDL semantics: bare CREATE on an
  * existing stream FAILS, `IF NOT EXISTS` makes it a no-op (unlike the TVF
  * surface, whose analysis-time builders must be unconditionally
  * idempotent). This was SURVEY §4's declared-optional third custom piece.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    GraftSqlParser.parseDdl(sqlText).getOrElse(delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object GraftSqlParser {

  private val Flags = Pattern.CASE_INSENSITIVE | Pattern.DOTALL
  // identifier: plain or backquoted; root: single-quoted path
  private val Ident = "(`[^`]+`|[a-zA-Z_][a-zA-Z0-9_.-]*)"
  private val Root = "'([^']+)'"
  private val OptsP = "\\(([^)]*)\\)"

  private val CreateP = Pattern.compile(
    s"\\s*CREATE\\s+STREAM\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$Ident\\s+IN\\s+$Root" +
      s"(\\s+WITH\\s*$OptsP)?\\s*;?\\s*", Flags)
  private val DropP = Pattern.compile(
    s"\\s*DROP\\s+STREAM\\s+(IF\\s+EXISTS\\s+)?$Ident\\s+IN\\s+$Root\\s*;?\\s*", Flags)
  private val AlterP = Pattern.compile(
    s"\\s*ALTER\\s+STREAM\\s+$Ident\\s+IN\\s+$Root\\s+SET\\s*$OptsP\\s*;?\\s*", Flags)
  private val DescP = Pattern.compile(
    s"\\s*(?:DESCRIBE|DESC)\\s+STREAM\\s+$Ident\\s+IN\\s+$Root\\s*;?\\s*", Flags)
  private val ShowP = Pattern.compile(
    s"\\s*SHOW\\s+STREAMS\\s+IN\\s+$Root\\s*;?\\s*", Flags)

  private def unquote(ident: String): String =
    if (ident.startsWith("`")) ident.substring(1, ident.length - 1) else ident

  // Bad options fail at parse time with a plain IllegalArgumentException
  // (Spark 4's ParseException is error-class keyed — a custom message would
  // need a registered class; the statement text is in the message instead).
  private def parseOpts(s: String, stmt: String): Map[String, Long] =
    if (s == null || s.trim.isEmpty) Map.empty
    else s.split(",").map { kv =>
      val parts = kv.split("=", 2)
      require(parts.length == 2, s"bad option '$kv' (want key = integer) in: $stmt")
      val k = parts(0).trim.toLowerCase
      require(Set("retention_ms", "replica", "ack_count").contains(k),
        s"unknown stream option '$k' (retention_ms, replica, ack_count) in: $stmt")
      k -> parts(1).trim.toLong
    }.toMap

  private def attrs(fields: (String, org.apache.spark.sql.types.DataType)*): Seq[Attribute] =
    fields.map { case (n, t) => AttributeReference(n, t, nullable = false)() }

  private val ExplainP = Pattern.compile(
    "\\s*EXPLAIN\\s+(?:(EXTENDED|FORMATTED|CODEGEN|COST)\\s+)?(.+)", Flags)

  /** Try the DDL grammar; None = not ours, delegate. */
  def parseDdl(sqlText: String): Option[LogicalPlan] = {
    // EXPLAIN over a stream-DDL statement: Spark's grammar would reject the
    // inner statement (it never reaches the injected parser), so unwrap it
    // here — the plan explains WITHOUT running, since the DDL side effect
    // lives in GraftProcedureExec.doExecute and EXPLAIN never executes.
    val ex = ExplainP.matcher(sqlText)
    if (ex.matches()) {
      return parseDdl(ex.group(2)).map { inner =>
        import org.apache.spark.sql.execution._
        val mode = Option(ex.group(1)).map(_.toUpperCase) match {
          case Some("EXTENDED")  => ExtendedMode
          case Some("FORMATTED") => FormattedMode
          case Some("CODEGEN")   => CodegenMode
          case Some("COST")      => CostMode
          case _                 => SimpleMode
        }
        org.apache.spark.sql.execution.command.ExplainCommand(inner, mode)
      }
    }
    val m = CreateP.matcher(sqlText)
    if (m.matches()) {
      val ifNotExists = m.group(1) != null
      val name = unquote(m.group(2))
      val root = m.group(3)
      val opts = parseOpts(m.group(5), sqlText)
      val replica = opts.getOrElse("replica", 1L).toInt
      val ack = opts.getOrElse("ack_count", 1L).toInt
      val retention = opts.getOrElse("retention_ms", -1L)
      return Some(GraftProcedureCall("create_stream",
        attrs("name" -> StringType, "stream_id" -> LongType, "created" -> BooleanType),
        () => {
          val cat = new EsCatalog(root)
          val (id, created) =
            if (ifNotExists) cat.createStreamIfAbsent(name, replica, ack, retention)
            else (cat.createStream(name, replica, ack, retention), true)
          Seq(Row(name, id, created))
        }))
    }
    val d = DropP.matcher(sqlText)
    if (d.matches()) {
      val ifExists = d.group(1) != null
      val name = unquote(d.group(2))
      val root = d.group(3)
      return Some(GraftProcedureCall("drop_stream",
        attrs("name" -> StringType, "dropped" -> BooleanType),
        () => {
          val cat = new EsCatalog(root)
          val dropped = cat.dropStreamIfExists(name)
          if (!dropped && !ifExists)
            throw new IllegalArgumentException(s"no stream '$name' under $root")
          Seq(Row(name, dropped))
        }))
    }
    val a = AlterP.matcher(sqlText)
    if (a.matches()) {
      val name = unquote(a.group(1))
      val root = a.group(2)
      val opts = parseOpts(a.group(3), sqlText)
      require(opts.nonEmpty, s"ALTER STREAM ... SET () needs at least one option: $sqlText")
      return Some(GraftProcedureCall("alter_stream",
        attrs("name" -> StringType, "stream_id" -> LongType, "replica" -> LongType,
          "ack_count" -> LongType, "retention_ms" -> LongType),
        () => {
          val cat = new EsCatalog(root)
          val id = cat.getStream(name).getOrElse(
            throw new IllegalArgumentException(s"no stream '$name' under $root"))
          val st = EsLog.update(cat.streamDir(name),
            opts.get("replica").map(_.toInt), opts.get("ack_count").map(_.toInt),
            opts.get("retention_ms"))
          Seq(Row(name, id, st.replica.toLong, st.ackCount.toLong, st.retentionMs))
        }))
    }
    val de = DescP.matcher(sqlText)
    if (de.matches()) {
      val name = unquote(de.group(1))
      val root = de.group(2)
      return Some(GraftProcedureCall("describe_stream",
        attrs("name" -> StringType, "stream_id" -> LongType, "epoch" -> LongType,
          "start_offset" -> LongType, "next_offset" -> LongType,
          "replica" -> LongType, "ack_count" -> LongType,
          "retention_ms" -> LongType, "deleted" -> BooleanType),
        () => {
          val cat = new EsCatalog(root)
          val id = cat.getStream(name).getOrElse(
            throw new IllegalArgumentException(s"no stream '$name' under $root"))
          val st = EsLog.describe(cat.streamDir(name))
          Seq(Row(name, id, st.epoch, st.startOffset, st.nextOffset,
            st.replica.toLong, st.ackCount.toLong, st.retentionMs, st.deleted))
        }))
    }
    val sh = ShowP.matcher(sqlText)
    if (sh.matches()) {
      val root = sh.group(1)
      return Some(GraftProcedureCall("show_streams",
        attrs("name" -> StringType, "stream_id" -> LongType, "epoch" -> LongType,
          "start_offset" -> LongType, "next_offset" -> LongType,
          "deleted" -> BooleanType),
        () => {
          val spark = org.apache.spark.sql.SparkSession.active
          new EsCatalog(root).listStreams(spark).collect().toSeq
        }))
    }
    None
  }
}
