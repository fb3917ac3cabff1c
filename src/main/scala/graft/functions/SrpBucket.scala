package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native signed-random-projection bucket (portable weight family):
  * bit p of the result is 1 iff
  * sum_j (+-x_j) > 0, with the sign of (p, j) = parity of
  * ((seed + p*1009 + j) * 2654435761) mod 1e9+7 — the DuckDB-mirrorable
  * SRP family of Ann.srpBucketPortable, evaluated as one tight
  * planes x dim loop instead of ~planes x dim interpreted
  * higher-order-function lambdas per row (HOFs are CodegenFallback).
  * The projection sum accumulates in the same left-to-right element
  * order as the aggregate() fold, so buckets are bit-for-bit identical
  * to the column formulation and to the SQL oracle.
  */
case class SrpBucketPortableExpr(vec: Expression, seed: Expression, planes: Int)
  extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = seed

  override def checkInputDataTypes(): TypeCheckResult =
    if (vec.dataType == ArrayType(DoubleType, containsNull = false) ||
        vec.dataType == ArrayType(DoubleType, containsNull = true)) {
      if (seed.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"srp_bucket seed must be bigint, got ${seed.dataType}")
    } else TypeCheckResult.TypeCheckFailure(
      s"srp_bucket requires array<double>, got ${vec.dataType}")

  override def dataType: DataType = LongType

  override protected def nullSafeEval(v: Any, s: Any): Any =
    SrpBucketPortable.bucket(v.asInstanceOf[ArrayData],
      s.asInstanceOf[Long], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, s) =>
      s"graft.functions.SrpBucketPortable.bucket($v, $s, $planes)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpBucketPortableExpr =
    copy(vec = newLeft, seed = newRight)

  override def prettyName: String = "srp_bucket_portable"
}

object SrpBucketPortable {

  /** Static entry point referenced from generated code. */
  def bucket(arr: ArrayData, seed: Long, planes: Int): Long = {
    val d = arr.numElements()
    var out = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var j = 0
      while (j < d) {
        val w = ((seed + p.toLong * 1009L + j.toLong) * 2654435761L) % 1000000007L
        val x = arr.getDouble(j)
        s += (if (w % 2L == 1L) x else -x)
        j += 1
      }
      if (s > 0.0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Column API: `seed` is cast to bigint. */
  def apply(vec: Column, seed: Column, planes: Int): Column =
    Bridge.column(SrpBucketPortableExpr(
      Bridge.expression(vec), Bridge.expression(seed.cast("long")), planes))
}
