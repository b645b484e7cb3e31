package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Spark 4 internals: converting between
  * the public `Column` and Catalyst `Expression` for our native functions.
  * Lives under `org.apache.spark.sql` for access; nothing else in the
  * codebase touches Spark internals directly.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
