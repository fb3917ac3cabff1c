package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into Spark's private[sql] Column<->Expression
  * converters, used to build Catalyst expressions the public functions
  * API can't (e.g. bit shifts by a Column amount). Lives under
  * org.apache.spark.sql to satisfy the private[sql] access scope.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
