package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package bridge: Spark 4 Columns wrap ColumnNodes and the classic
  * Expression↔Column converters are `private[sql]`; this re-exports the
  * two conversions graft's native expressions need. No Spark internals
  * are modified — this only widens visibility. */
object GraftBridge {
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
