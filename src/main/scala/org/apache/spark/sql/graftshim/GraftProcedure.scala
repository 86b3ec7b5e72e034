package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{BooleanType, StringType}

/** EXECUTION-time procedure call for the side-effecting SQL surface.
  *
  * The graft admin table functions run their builder at ANALYSIS (a TVF
  * splices a LogicalPlan at resolution). For the idempotent lifecycle
  * functions (create/drop stream, commit-group CAS) that is safe and
  * documented; for index MAINTENANCE (`graft_sim_index_add` family) it was
  * a loaded foot-gun — `EXPLAIN SELECT * FROM graft_sim_index_add(...)`
  * appended to the index, and a view containing the call re-ran the append
  * on every re-resolution.
  *
  * [[GraftProcedureCall]] closes the class: the TVF builder now returns
  * this INERT leaf carrying a thunk; analysis and EXPLAIN only build the
  * plan, and the side effect runs when the statement EXECUTES —
  * [[GraftProcedureStrategy]] plans it as [[GraftProcedureExec]], whose
  * `doExecute` invokes the thunk on the driver exactly once per execution
  * (CALL-procedure semantics: re-executing the statement re-runs the
  * procedure, as INSERT re-runs an insert — the batch-id replay guard in
  * [[graft.operators.IndexCommit]] is what makes an ACCIDENTAL re-run of
  * an `..._add` with a batch id harmless). */
final case class GraftProcedureCall(procName: String,
                                    override val output: Seq[Attribute],
                                    run: () => Seq[Row]) extends LeafNode {
  // a one-row local result: never worth broadcasting decisions elsewhere
  override def computeStats(): Statistics = Statistics(sizeInBytes = 1L)
}

object GraftProcedureCall {
  /** The (dir, ok) output every index-maintenance procedure returns. */
  def dirOkOutput(): Seq[Attribute] = Seq(
    AttributeReference("dir", StringType, nullable = false)(),
    AttributeReference("ok", BooleanType, nullable = false)())
}

object GraftProcedureStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: GraftProcedureCall => GraftProcedureExec(p) :: Nil
    case _ => Nil
  }
}

final case class GraftProcedureExec(call: GraftProcedureCall) extends LeafExecNode {
  override def output: Seq[Attribute] = call.output
  override protected def doExecute(): RDD[InternalRow] = {
    // driver-side: the procedures are metadata/maintenance ops that launch
    // their own Spark jobs internally; the result rows are a tiny status.
    // UnsafeRow-encode them — downstream operators assume unsafe rows.
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(schema)
    val rows = call.run().map(r =>
      proj(conv(r).asInstanceOf[InternalRow]).copy(): InternalRow)
    sparkContext.parallelize(rows, 1)
  }
}
