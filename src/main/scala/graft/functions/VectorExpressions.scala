package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Runtime kernel for [[LongArrayDot]]: tight primitive loop over the
  * unsafe array data — no per-element lambda dispatch (Spark's
  * higher-order `zip_with`/`aggregate` evaluate an interpreted lambda per
  * element, which dominates wide-vector similarity scans).
  */
object VectorUtil {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getLong(i) * b.getLong(i); i += 1 }
    acc
  }
}

/** Exact int64 dot product of two array<bigint> columns as a native
  * Catalyst expression with codegen (SURVEY.md §2.8 extension surface:
  * custom Expression beats UDF beats driver loop). Element nulls are not
  * expected (inputs are produced by quantization) — mirrors the exact
  * arithmetic of `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, +)`, so
  * results are bit-identical to the DuckDB oracle formulation.
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorUtil.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder on the object's companion class — plain static call
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VectorUtil.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Runtime kernel for [[SrpBandCodes]]: all `bands*bits` hyperplane
  * dot-products and the band-code packing in one tight primitive loop.
  * The hyperplane components are the same deterministic integer formula
  * the DuckDB oracle evaluates — h(j,k) = ((j*1000003 + k*7919) *
  * 2654435761) % 2001 - 1000, positive before the mod — so the codes
  * are bit-identical to both the SQL higher-order formulation and the
  * oracle.
  */
object SrpUtil {
  def bandCodes(q: ArrayData, bands: Int, bits: Int): ArrayData = {
    val d = q.numElements()
    val codes = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var code = 0L
      var r = 0
      while (r < bits) {
        val j = b * bits + r
        var acc = 0L
        var k = 0
        while (k < d) {
          acc += q.getLong(k) *
            (((j * 1000003 + k * 7919) * 2654435761L) % 2001L - 1000L)
          k += 1
        }
        if (acc >= 0L) code |= 1L << r
        r += 1
      }
      codes(b) = code
      b += 1
    }
    new GenericArrayData(codes)
  }
}

/** Signed-random-projection LSH band codes of a quantized array<bigint>
  * vector as a native codegen'd expression. Spark's higher-order
  * `transform`/`aggregate` evaluate an interpreted lambda per element —
  * for SRP banding that is `bands*bits*dim` lambda dispatches per row;
  * this expression replaces them with one static call.
  */
case class SrpBandCodes(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    SrpUtil.bandCodes(v.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SrpUtil.bandCodes($c, $bands, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Codegen'd exact int64 dot product over quantized vectors. */
  def ldot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    column(LongArrayDot(expression(a), expression(b)))
  }

  /** Codegen'd SRP-LSH band codes over a quantized vector. */
  def srpCodes(q: Column, bands: Int, bits: Int): Column = {
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    column(SrpBandCodes(expression(q), bands, bits))
  }
}
