package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Connect-agnostic Column API (Spark 4 removed public
  * `Column.expr` / `new Column(expr)`); `ExpressionUtils` is private[sql],
  * so this shim lives in an org.apache.spark.sql subpackage — the same
  * technique third-party Spark extensions (e.g. connectors adding native
  * expressions) use.
  */
object Shim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
