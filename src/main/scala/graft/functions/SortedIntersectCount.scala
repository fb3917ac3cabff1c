package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** |a ∩ b| for two SORTED, duplicate-free bigint arrays as one linear
  * merge scan — the triangle-count kernel.
  *
  * `size(array_intersect(a, b))` builds a hash set per ROW and
  * materializes the intersection array it immediately discards; on the
  * edge-iterator join (one intersection per oriented edge, arrays up to
  * O(sqrt m) long) that allocation dominates the query. This expression
  * is a zero-allocation two-pointer merge inside whole-stage codegen.
  *
  * Inputs MUST be sorted ascending without duplicates — guaranteed by
  * the `array_sort(collect_list(...))` adjacency build over distinct
  * canonical edges (graft.algos.TriangleCount.globalCount).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires two array<bigint> columns, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectCount.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_count"
}

object SortedIntersectCount {

  /** Static entry point referenced from generated code. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(SortedIntersectCountExpr(
      Bridge.expression(a), Bridge.expression(b)))
}
