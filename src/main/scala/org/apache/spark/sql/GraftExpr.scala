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
}
