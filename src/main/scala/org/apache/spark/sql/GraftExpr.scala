package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters in
  * Spark 4.x (`org.apache.spark.sql.classic.ExpressionUtils`). Declared
  * inside package `org.apache.spark.sql` so the access modifier is
  * satisfied; this is the supported pattern for libraries registering
  * native Catalyst expressions without going through FunctionRegistry.
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER ColumnNode -> catalyst conversion. [[expression]] returns a lazy
    * `ColumnNodeExpression` wrapper that only converts when a Dataset
    * analysis pass visits it — an expression handed straight to the
    * analyzer through a FunctionRegistry builder never gets that visit and
    * dies Unevaluable at codegen. This converter runs the same translation
    * immediately; nested `UnresolvedFunction`s in the result resolve
    * normally once the tree is in the plan. */
  def catalystExpression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** Unwrap a sort-order Column (`col(k).desc`, `asc_nulls_last`, ...) into
    * (bare key column, descending?, nullsFirst?). In Spark 4 the Column holds
    * an `internal.SortOrder` ColumnNode (catalyst conversion is deferred), so
    * the unwrap has to happen at the ColumnNode level. */
  def sortOrder(c: Column): Option[(Column, Boolean, Boolean)] = c.node match {
    case so: internal.SortOrder =>
      Some((Column(so.child),
        so.sortDirection == internal.SortOrder.Descending,
        so.nullOrdering == internal.SortOrder.NullsFirst))
    case _ => None
  }
}
