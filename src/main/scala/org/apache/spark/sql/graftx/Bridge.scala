package org.apache.spark.sql.graftx

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
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

  /** Apply an extensions object's injected functions onto an existing
    * registry (used to test GraftExtensions against a live session without
    * tearing down the shared SparkContext). */
  def registerInjectedFunctions(ext: SparkSessionExtensions,
      reg: FunctionRegistry): Unit = {
    ext.registerFunctions(reg)
    ()
  }
}
