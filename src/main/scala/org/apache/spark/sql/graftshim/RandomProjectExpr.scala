package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd Johnson–Lindenstrauss random projection: `y_p = scale *
  * Σ_d x_d · w_pd` for a fixed ±1 (Rademacher) weight matrix, all `k`
  * output components in one pass over the input array. The same projection
  * family as [[LshBucketExpr]] — this keeps the folded VALUES where the LSH
  * bucket keeps only the signs, so downstream consumers (projected-space
  * candidate generation, compact embedding storage) get real coordinates.
  *
  * Determinism contract: each component is the identical left-to-right IEEE
  * fold on every engine, and `scale` multiplies once at the end — a DuckDB
  * `list_reduce((acc, x) -> acc + x) * scale` reproduces the doubles
  * bit-exactly. A null vector yields null; a length mismatch against the
  * weight rows or a null element also yields null (a projection of a
  * mis-sized vector is meaningless — unlike the LSH bucket there is no
  * harmless `0` to collapse to). */
case class RandomProjectExpr(child: Expression, weights: Seq[Seq[Double]],
                             scale: Double)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "random_project"

  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != w(0).length) return null
    var d = 0
    while (d < n) { if (x.isNullAt(d)) return null; d += 1 }
    val out = new Array[Double](w.length)
    var p = 0
    while (p < w.length) {
      val row = w(p)
      var s = 0.0
      d = 0
      while (d < n) { s += x.getDouble(d) * row(d); d += 1 }
      out(p) = s * scale
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("rpWeights", w, "double[][]")
    val x = ctx.freshName("vec")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val p = ctx.freshName("p")
    val s = ctx.freshName("s")
    val ok = ctx.freshName("ok")
    val out = ctx.freshName("out")
    val isNull = ctx.freshName("isNull")
    val value = ctx.freshName("value")
    val code =
      code"""
        |${childGen.code}
        |boolean $isNull = true;
        |org.apache.spark.sql.catalyst.util.ArrayData $value = null;
        |if (!${childGen.isNull}) {
        |  org.apache.spark.sql.catalyst.util.ArrayData $x =
        |    (org.apache.spark.sql.catalyst.util.ArrayData) ${childGen.value};
        |  final int $n = $x.numElements();
        |  boolean $ok = ($n == $wRef[0].length);
        |  for (int $d = 0; $ok && $d < $n; $d++) { $ok = !$x.isNullAt($d); }
        |  if ($ok) {
        |    double[] $out = new double[$wRef.length];
        |    for (int $p = 0; $p < $wRef.length; $p++) {
        |      double $s = 0.0;
        |      for (int $d = 0; $d < $n; $d++) {
        |        $s += $x.getDouble($d) * $wRef[$p][$d];
        |      }
        |      $out[$p] = $s * ${scale}D;
        |    }
        |    $value = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        |    $isNull = false;
        |  }
        |}
      """.stripMargin
    ev.copy(code = code,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .isNullVariable(isNull),
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .variable(value, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
