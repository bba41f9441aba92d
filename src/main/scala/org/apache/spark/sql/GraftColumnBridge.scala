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

  /** Wrap a logical plan as a DataFrame (Dataset.ofRows went private[sql]
    * with the Connect unification) — the seam custom operators need to
    * hand their logical nodes back to the session. */
  def ofRows(spark: SparkSession, plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The classic session's experimental methods (extraStrategies). */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental

  /** EAGER ColumnNode → Catalyst conversion. `expression()` wraps the node
    * lazily (ColumnNodeExpression), which hides sort metadata — a
    * `col.desc` arrives as an opaque wrapper, not a catalyst SortOrder,
    * and the wrapper's internal nodes are not serializable in task
    * closures. Custom operators that need to LOOK AT the expression
    * (direction, null ordering) must convert eagerly. */
  def eagerExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
