package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Codegen'd content-defined chunk hashing of a binary payload: the fused
  * form of [[graft.operators.Multimodal.cdcChunkRows]]'s staged
  * hex → byte-array → cut-filter → chunk → hash60 → array_distinct Column
  * pipeline, as ONE static call per row inside whole-stage codegen.
  *
  * Bit-identical to the composed form (unit-pinned against it on random
  * payloads): cuts at 1-based byte offsets `c ∈ [window, n-1]` where
  * `Σ_{k<window} B[c−k]·131^k ≡ 0 (mod divisor)` (B = unsigned byte value;
  * exact in 64-bit for window ≤ 8), chunks between consecutive cuts
  * (plus the implicit 0 and n), each chunk reduced to the portable 60-bit
  * hash of its UPPERCASE-HEX text (`Portable.hash60` = first 60 bits of
  * md5 — the hex text is what makes the value reproducible by the SQL
  * oracle), duplicates dropped keeping first occurrence
  * (`array_distinct` semantics). Null input → null.
  *
  * Why an Expression: the Column form's higher-order functions evaluate
  * interpreted, per element — measured ~14 s for 1.5 MB of payloads even
  * after staging (and 2× that through the hex blow-up); this loop runs
  * compiled over the raw bytes, no hex string or boxed byte array ever
  * materializes per row. */
case class CdcChunkHashesExpr(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(window >= 1 && window <= 8, "window must be in [1, 8]")
  require(divisor >= 1, "divisor must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cdc_chunk_hashes"

  override def nullSafeEval(v: Any): Any =
    CdcChunkHashesExpr.computeArrayData(
      v.asInstanceOf[Array[Byte]], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.CdcChunkHashesExpr" +
        s".computeArrayData($c, $window, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fixed-grid sibling of [[CdcChunkHashesExpr]]: distinct 60-bit hashes of
  * the payload's `chunkBytes`-aligned chunks (short tail kept), same
  * uppercase-hex-text hashing — one compiled pass per row. */
case class GridChunkHashesExpr(child: Expression, chunkBytes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(chunkBytes >= 1, "chunkBytes must be positive")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "grid_chunk_hashes"

  override def nullSafeEval(v: Any): Any =
    GridChunkHashesExpr.computeArrayData(v.asInstanceOf[Array[Byte]], chunkBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graftshim.GridChunkHashesExpr" +
        s".computeArrayData($c, $chunkBytes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GridChunkHashesExpr {
  def computeArrayData(payload: Array[Byte], chunkBytes: Int): ArrayData = {
    val n = payload.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var lo = 0
    while (lo < n) {
      val hi = math.min(lo + chunkBytes, n)
      seen.add(CdcChunkHashesExpr.hash60OfChunk(payload, lo, hi, md))
      lo = hi
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

object CdcChunkHashesExpr {
  private val Hex = "0123456789ABCDEF".toCharArray

  /** hash60 of the uppercase-hex text of payload[lo, hi) — the shared
    * chunk-content address ([[graft.functions.Portable.hash60]] over the
    * engine-portable hex representation). */
  private[graftshim] def hash60OfChunk(payload: Array[Byte], lo: Int, hi: Int,
                                       md: java.security.MessageDigest): Long = {
    val hex = new Array[Byte]((hi - lo) * 2)
    var j = lo
    var p = 0
    while (j < hi) {
      val b = payload(j) & 0xff
      hex(p) = Hex(b >>> 4).toByte
      hex(p + 1) = Hex(b & 0xf).toByte
      j += 1
      p += 2
    }
    md.reset()
    val d = md.digest(hex)
    var v = 0L
    var q = 0
    while (q < 8) { v = (v << 8) | (d(q) & 0xffL); q += 1 }
    v >>> 4
  }

  def computeArrayData(payload: Array[Byte], window: Int, divisor: Int): ArrayData =
    new GenericArrayData(compute(payload, window, divisor))

  /** The whole per-row computation in one compiled pass; see the class doc
    * for the exact (oracle-reproducible) semantics. */
  def compute(payload: Array[Byte], window: Int, divisor: Int): Array[Long] = {
    val n = payload.length
    val pow = new Array[Long](window)
    pow(0) = 1L
    var k = 1
    while (k < window) { pow(k) = pow(k - 1) * 131L; k += 1 }
    // cut offsets: [0] ++ qualifying c in [window, n-1] ++ [n]
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    var c = window
    while (c <= n - 1) {
      var h = 0L
      k = 0
      while (k < window) {
        h += (payload(c - k - 1) & 0xffL) * pow(k)
        k += 1
      }
      if (h % divisor == 0L) cuts.add(c)
      c += 1
    }
    cuts.add(n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < cuts.size - 1) {
      val lo = cuts.get(i)
      val hi = cuts.get(i + 1)
      if (hi > lo) seen.add(hash60OfChunk(payload, lo, hi, md))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
}
