package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 made the `Column` ⇄ `Expression` conversions `private[sql]`
  * (`classic.ExpressionUtils`); a library adding native expressions needs
  * exactly these two calls, so this shim re-exports them — the same pattern
  * Spark connectors use for their function libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
