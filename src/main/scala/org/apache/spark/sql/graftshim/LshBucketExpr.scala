package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd hyperplane-LSH bucket: the `planes`-bit sign bucket of a vector
  * under a fixed ±1 weight matrix, all projections in ONE pass over the
  * array. The composed formulation (`planes` separate dot products against
  * literal weight arrays, summed `when(proj > 0, 1<<p)` bits) re-reads the
  * vector once per plane through interpreted HOFs; this loop reads it once
  * total.
  *
  * Bit-compatible with the composed form: each projection is the identical
  * left-to-right IEEE fold, and the null-swallowing of
  * `when(null > 0, ..).otherwise(0)` is mirrored — a null vector, a length
  * mismatch against the weight rows, or any null element yields bucket 0
  * (never null), exactly as the composed bits did. */
case class LshBucketExpr(child: Expression, weights: Seq[Seq[Double]])
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_bucket"

  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0L
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w(0).length) return 0L
    var d = 0
    while (d < n) { if (x.isNullAt(d)) return 0L; d += 1 }
    var bucket = 0L
    var p = 0
    while (p < w.length) {
      val row = w(p)
      var s = 0.0
      d = 0
      while (d < n) { s += x.getDouble(d) * row(d); d += 1 }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("lshWeights", w, "double[][]")
    val x = ctx.freshName("vec")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val p = ctx.freshName("p")
    val s = ctx.freshName("s")
    val ok = ctx.freshName("ok")
    val bucket = ctx.freshName("bucket")
    val code =
      code"""
        |${childGen.code}
        |long $bucket = 0L;
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $x =
        |    (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value};
        |  final int $n = $x.numElements();
        |  boolean $ok = ($n == $wRef[0].length);
        |  for (int $d = 0; $ok && $d < $n; $d++) { $ok = !$x.isNullAt($d); }
        |  if ($ok) {
        |    for (int $p = 0; $p < $wRef.length; $p++) {
        |      double $s = 0.0;
        |      for (int $d = 0; $d < $n; $d++) {
        |        $s += $x.getDouble($d) * $wRef[$p][$d];
        |      }
        |      if ($s > 0) $bucket |= (1L << $p);
        |    }
        |  }
        |}
      """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(bucket, LongType))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
