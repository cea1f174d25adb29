package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between Catalyst [[Expression]]s and the public [[Column]] API.
  * Spark 4 made the classic converters package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so library code that
  * defines native expressions needs this one-file shim in the sql
  * namespace — the same approach Spark-native extension libraries use.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
