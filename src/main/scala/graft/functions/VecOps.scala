package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer-vector kernels for the similarity operators — a
  * whole-stage-codegen `Expression` (like [[SimHash64Expr]]) replacing the
  * `aggregate(zip_with(...))` higher-order-function form: HOFs are
  * interpreted per element (no codegen), which made the 64-dim dot product
  * the hot path of q30–q32 (3 dots per cosine, 48 per LSH bucketing).
  * The kernel is one tight `long` loop the JIT vectorizes.
  *
  * Semantics identical to `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`
  * on equal-length null-free arrays (the quantized-embedding contract).
  */
object VecOps {

  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  /** Register `dotq` in the session's function registry (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dotq",
      exprs => DotQExpr(exprs.head, exprs(1)),
      "built-in"
    )

  /** Column API: dotq(a, b) — call [[register]] on the session first. */
  def dotq(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("dotq", a, b)
}

case class DotQExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"dotq requires array<bigint> args, got ${l.sql}, ${r.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dotLong($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotQExpr =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dotq"
}
