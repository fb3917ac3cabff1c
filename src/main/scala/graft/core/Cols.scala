package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ShiftLeft, ShiftRight}
import org.apache.spark.sql.graftbridge.Bridge

/** Column helpers that drop to Catalyst expressions where the Scala
  * functions API is narrower than the SQL surface.
  *
  * `functions.shiftleft/shiftright` only accept a literal Int shift, but
  * the underlying Catalyst ShiftLeft/ShiftRight are full binary
  * expressions (SQL accepts `shiftleft(x, b)` with a column b). Bit-level
  * operators like SimHash packing need the column-shift form inside
  * higher-order-function lambdas, so expose it directly — still fully
  * codegen'd (both expressions implement doGenCode).
  */
object Cols {

  private def expr(c: Column): Expression = Bridge.expression(c)
  private def col(e: Expression): Column = Bridge.column(e)

  /** shiftleft with a Column shift amount. */
  def shiftLeftC(v: Column, shift: Column): Column =
    col(ShiftLeft(expr(v), expr(shift)))

  /** shiftright (arithmetic) with a Column shift amount. */
  def shiftRightC(v: Column, shift: Column): Column =
    col(ShiftRight(expr(v), expr(shift)))
}
