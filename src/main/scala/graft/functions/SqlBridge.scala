// Lives in Spark's package to reach the private[sql] Column <->
// Expression converters — the standard technique for third-party
// Catalyst expressions on Spark 4's ColumnNode API.
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
