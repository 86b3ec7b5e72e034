package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd affine projection under a literal weight matrix: `y_p =
  * (Σ_d x_d · w_pd) − bias_p`, all `k` components in one pass over the
  * input array. [[RandomProjectExpr]]'s general-matrix sibling — that one
  * carries a ±1 matrix and a scalar scale; this one carries arbitrary row
  * weights plus a per-component offset, which is exactly the shape of a
  * mean-centered PCA projection (`y = W(x − μ)` with `bias = W·μ`
  * precomputed driver-side, so the executor pass stays a single fused
  * dot-and-subtract).
  *
  * Determinism contract: each dot is the left-to-right IEEE fold and the
  * bias subtracts ONCE at the end — a SQL engine folding `x[d]·w[d]` in
  * index order and subtracting the bias literal reproduces every double
  * bit-exactly. Null vector, length mismatch, or null element ⇒ null. */
case class AffineProjectExpr(child: Expression, weights: Seq[Seq[Double]],
                             bias: Seq[Double])
    extends UnaryExpression with ImplicitCastInputTypes {

  require(weights.nonEmpty && weights.length == bias.length,
    s"weights ${weights.length} rows vs bias ${bias.length}")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "affine_project"

  @transient private lazy val w: Array[Array[Double]] =
    weights.map(_.toArray).toArray
  @transient private lazy val b: Array[Double] = bias.toArray

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
      out(p) = s - b(p)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val wRef = ctx.addReferenceObj("apWeights", w, "double[][]")
    val bRef = ctx.addReferenceObj("apBias", b, "double[]")
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
        |      $out[$p] = $s - $bRef[$p];
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
