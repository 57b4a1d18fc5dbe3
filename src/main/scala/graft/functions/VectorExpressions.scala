package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

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

object VectorFunctions {
  /** Codegen'd exact int64 dot product over quantized vectors. */
  def ldot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    column(LongArrayDot(expression(a), expression(b)))
  }
}
