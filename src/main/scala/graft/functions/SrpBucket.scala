package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native signed-random-projection bucket (portable weight family):
  * bit p of the result is 1 iff sum_j (+-x_j) > 0, with the sign of
  * (p, j) = parity of the first hex digit of
  * md5(cast(seed + p*1009 + j as string)) — DuckDB computes the
  * identical digest (`md5(CAST(n AS VARCHAR))`), so buckets mirror
  * bit-for-bit.
  *
  * WHY md5 and not modular arithmetic: the previous family — parity of
  * ((seed + p*1009 + j) * 2654435761) mod 1e9+7 — hashes CONSECUTIVE
  * integers multiplicatively, whose low bits have lattice structure:
  * measured plane-pair sign agreement reached 63/64 (near-duplicate
  * hyperplanes with period ~3), collapsing 2^12 buckets to a few
  * hundred and sending the LSH self-join quadratic on large corpora
  * (31M candidate pairs on a 22k-vector corpus). The md5 family
  * measures at ideal binomial plane independence (worst agreement
  * 44/64, top bucket occupancy ~n/2^planes). Signs are
  * data-independent, so the planes x dim table is computed once per
  * (seed, planes, dim) and cached — zero per-row hashing.
  *
  * The projection sum accumulates in the same left-to-right element
  * order as the aggregate() fold, so buckets are bit-for-bit identical
  * to the SQL oracle.
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

  /** sign(+1) iff the first hex digit of md5(n.toString) is odd. */
  private def md5SignPositive(n: Long): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val digest = md.digest(n.toString.getBytes(
      java.nio.charset.StandardCharsets.US_ASCII))
    ((digest(0) >> 4) & 1) == 1
  }

  /** (seed, planes, dim) -> flat planes x dim table of +1/-1 weights;
    * data-independent, so computed once per key per JVM.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Double]]()

  private def signs(seed: Long, planes: Int, d: Int): Array[Double] =
    signCache.computeIfAbsent((seed, planes, d), _ => {
      val w = new Array[Double](planes * d)
      var p = 0
      while (p < planes) {
        var j = 0
        while (j < d) {
          w(p * d + j) =
            if (md5SignPositive(seed + p.toLong * 1009L + j.toLong)) 1.0
            else -1.0
          j += 1
        }
        p += 1
      }
      w
    })

  /** Static entry point referenced from generated code. */
  def bucket(arr: ArrayData, seed: Long, planes: Int): Long = {
    val d = arr.numElements()
    val w = signs(seed, planes, d)
    var out = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var j = 0
      while (j < d) {
        s += w(p * d + j) * arr.getDouble(j)
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
