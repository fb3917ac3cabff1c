package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Karp-Rabin rolling hash of a string's Unicode code points:
  * h = fold(codepoints)(h * 31 + cp) mod 1e9+7.
  *
  * Replaces the `aggregate(split(text, ""), ...)` higher-order-function
  * formulation on hot paths: HOF lambdas are interpreted even inside
  * codegen'd projections (CodegenFallback) and the per-char split
  * allocates one UTF8String per character — this expression is one
  * static JVM call per row inside whole-stage codegen, zero allocation
  * beyond the code-point scan.
  *
  * Semantics match the DuckDB oracle mirror
  * (`list_reduce(list_transform(str_split(text,''), ascii), ...)`)
  * exactly: DuckDB's str_split('') iterates code points and ascii()
  * returns the code point. (For pure-ASCII corpora this also equals the
  * old Spark HOF formulation bit-for-bit.)
  */
case class RollingHashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires a string column, got ${child.dataType}")
  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHashExpr =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {

  final val Mod = 1000000007L

  /** Static entry point referenced from generated code. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % Mod
      i += Character.charCount(cp)
    }
    h
  }

  /** Column API. */
  def apply(text: Column): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(text)))
}
