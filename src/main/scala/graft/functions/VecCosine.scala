package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Cosine similarity of two array<double> columns as ONE fused loop —
  * the scoring kernel of every ANN/near-dup path.
  *
  * The column formulation (aggregate(zip_with(...)) three times for
  * dot/norm/norm) runs INTERPRETED per candidate pair: higher-order
  * functions are CodegenFallback, and each fold allocates an
  * intermediate array. On LSH candidate streams (millions of pairs per
  * bucket-join) that interpretation dominates the query. This
  * expression is a single zero-allocation d-step loop inside
  * whole-stage codegen.
  *
  * Each of the three sums accumulates left-to-right exactly like the
  * aggregate() fold and DuckDB's list_dot_product, so scores are
  * bit-for-bit identical to the SQL oracle mirror.
  */
case class VecCosineExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine requires two array<double> columns, got " +
        s"${left.dataType} / ${right.dataType}")

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecCosine.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.VecCosine.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosineExpr =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_cosine"
}

object VecCosine {

  /** Static entry point referenced from generated code.
    *
    * Malformed-input contract (matches the DuckDB mirror's semantics
    * rather than silently diverging from it): mismatched dimensions
    * throw — DuckDB's list_dot_product errors on unequal lengths, and a
    * truncated score would be a silent wrong answer; a zero-norm vector
    * scores 0.0 against everything — the replaced HOF formulation
    * produced NaN there, which neither sorts deterministically nor
    * survives the micro-unit rounding the callers apply.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = a.numElements()
    if (b.numElements() != d)
      throw new IllegalArgumentException(
        s"vec_cosine: dimension mismatch ($d vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < d) {
      val x = a.getDouble(j); val y = b.getDouble(j)
      dot += x * y; na += x * x; nb += y * y
      j += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Same kernel with the query side pre-collected to a JVM array
    * (the fused multi-query aggregates) — identical fold order and
    * malformed-input contract as the ArrayData overload.
    */
  def cosine(a: Array[Double], b: ArrayData): Double = {
    val d = a.length
    if (b.numElements() != d)
      throw new IllegalArgumentException(
        s"vec_cosine: dimension mismatch ($d vs ${b.numElements()})")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var j = 0
    while (j < d) {
      val x = a(j); val y = b.getDouble(j)
      dot += x * y; na += x * x; nb += y * y
      j += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Column API. */
  def apply(a: Column, b: Column): Column =
    Bridge.column(VecCosineExpr(Bridge.expression(a), Bridge.expression(b)))
}
