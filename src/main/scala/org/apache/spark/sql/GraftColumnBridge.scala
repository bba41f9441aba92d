package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** In-JVM bridge between Spark 4's Connect-unified Column API and Catalyst
  * Expressions. Spark 4 made `Column.expr` / `new Column(expr)` private[sql]
  * (columns wrap ColumnNodes now); custom native expressions still need the
  * classic round-trip, so this shim lives in the sql package to reach it.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
