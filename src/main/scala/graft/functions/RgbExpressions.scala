package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{coalesce, element_at, lit, typedLit}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime helper for [[IsSimilarRgb]] — a static method the generated
  * code calls directly, so the predicate stays inside whole-stage codegen
  * (no ScalaUDF wrapper, no boxing).
  */
object RgbUtil {
  /** Parse "rgb(r, g, b)" (whitespace-tolerant); null on malformed input,
    * mirroring the reference's try/except-to-default behavior
    * (/root/reference/test.py:36-39,201-204).
    */
  def parse(s: UTF8String): Array[Int] = {
    if (s == null) return null
    val str = s.toString
    val open = str.indexOf('(')
    val close = str.lastIndexOf(')')
    if (open < 0 || close <= open || !str.substring(0, open).trim.equalsIgnoreCase("rgb"))
      return null
    val parts = str.substring(open + 1, close).split(",")
    if (parts.length != 3) return null
    try {
      val out = new Array[Int](3)
      var i = 0
      while (i < 3) { out(i) = parts(i).trim.toInt; i += 1 }
      out
    } catch { case _: NumberFormatException => null }
  }

  /** All three channels within +/- tolerance (test.py:36-39); malformed
    * input on either side => false (reference falls through to "unknown").
    */
  def similar(a: UTF8String, b: UTF8String, tolerance: Int): Boolean = {
    val x = parse(a); val y = parse(b)
    if (x == null || y == null) return false
    math.abs(x(0) - y(0)) <= tolerance &&
      math.abs(x(1) - y(1)) <= tolerance &&
      math.abs(x(2) - y(2)) <= tolerance
  }
}

/** `is_similar_rgb(color, target, tolerance)` — the reference's RGB
  * tolerance predicate (test.py:36-39) as a native Catalyst expression.
  * `doGenCode` emits a direct static call via `defineCodeGen`, so it
  * participates in whole-stage codegen (SURVEY.md §4 custom work item 1).
  * Standard null semantics (null in -> null out); the Column wrapper
  * coalesces to false to match the reference's fall-through.
  */
case class IsSimilarRgb(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = BooleanType

  override def nullSafeEval(a: Any, b: Any, t: Any): Any =
    RgbUtil.similar(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      t.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder on the object's companion class — plain static call
    defineCodeGen(ctx, ev, (a, b, t) => s"graft.functions.RgbUtil.similar($a, $b, $t)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Column-level API for the RGB operators (P9/P10). */
object RgbFunctions {
  /** True iff both CSS rgb() strings are within +/- tolerance per channel;
    * false (never null) on malformed/missing input.
    */
  def isSimilarRgb(color: Column, target: Column, tolerance: Int): Column = {
    // Spark 4's Column is Connect-agnostic; the shim bridges to Catalyst
    // expressions in classic (JVM) mode.
    import org.apache.spark.sql.graftshim.Shim.{column, expression}
    coalesce(column(IsSimilarRgb(expression(color), expression(target),
                                 expression(lit(tolerance)))),
             lit(false))
  }

  /** Exact color -> proficiency-level decode with "未知" default
    * (legend_map, test.py:471-482).
    */
  private[graft] val legendEntries = Map(
    "rgb(200, 200, 200)" -> "不會",
    "rgb(151, 195, 255)" -> "略懂",
    "rgb(102, 165, 255)" -> "中等",
    "rgb(41, 128, 255)"  -> "精通")

  def legendLevel(bg: Column): Column =
    coalesce(element_at(typedLit(legendEntries), bg), lit("未知"))
}
