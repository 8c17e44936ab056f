package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between graft's native Catalyst expressions and the public
 * `Column` API. Spark 4 moved the Expression↔Column conversions behind
 * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
 * libraries that ship custom expressions expose them through a shim in
 * the `org.apache.spark.sql` namespace — this is the only file outside
 * the `graft` package.
 */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
