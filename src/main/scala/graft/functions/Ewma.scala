package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `ewma_seq(xs, alpha)`: the exponentially-weighted moving average
  * recurrence over an ordered series, as one codegen'd expression —
  *   s_1   = x_1
  *   err_t = x_t − s_{t−1}
  *   s_t   = s_{t−1} + α·(x_t − s_{t−1})
  * returning the full (s, err) path: the smoothed level AND the
  * one-step-ahead forecast error (the residual an alerting rule
  * thresholds). Same frame class as [[CusumSeq]] — a feedback
  * recurrence neither window functions nor `aggregate` emit per-step —
  * and the same scale contract: callers hand it an ALREADY-AGGREGATED
  * dimension-sized series (hourly counts), so the per-row loop is
  * bounded by the time span, never the corpus.
  *
  * The arithmetic is a fixed IEEE sequence — err and the α-step both
  * read the SAME (x − s_prev) subtraction — mirrored token-for-token
  * by the DuckDB recursive-CTE oracle, so the paths are bit-identical
  * cross-engine.
  */
case class EwmaSeq(xs: Expression, alpha: Expression) extends BinaryExpression {

  override def left: Expression = xs
  override def right: Expression = alpha

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("s", DoubleType, nullable = false),
      StructField("err", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (xs.dataType, alpha.dataType) match {
      case (ArrayType(DoubleType, false), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      // getDouble cannot represent a null slot (the holt_seq rule).
      case (ArrayType(DoubleType, true), DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          "ewma_seq requires array<double> with non-nullable elements")
      case other => TypeCheckResult.TypeCheckFailure(
        s"ewma_seq requires (array<double>, double), got $other")
    }

  override def nullSafeEval(xsV: Any, alphaV: Any): Any =
    EwmaSeq.run(xsV.asInstanceOf[ArrayData], alphaV.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, a) => s"graft.functions.EwmaSeq.run($x, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(xs = newLeft, alpha = newRight)
}

object EwmaSeq {
  def run(xs: ArrayData, alpha: Double): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      if (i == 0) {
        s = x
        out(i) = InternalRow(s, 0.0)
      } else {
        val e = x - s
        s = s + alpha * e
        out(i) = InternalRow(s, e)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def ewmaSeq(xs: Column, alpha: Column): Column =
    ColumnBridge.column(EwmaSeq(ColumnBridge.expression(xs),
      ColumnBridge.expression(alpha)))
}
