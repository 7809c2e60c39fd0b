package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `cusum_seq(xs, mean, std)`: the two-sided CUSUM recurrence (Page
  * 1954) over an ordered series, as one codegen'd expression —
  *   sp_t = max(0, sp_{t−1} + ((x_t − mean) − 0.5·std))
  *   sn_t = max(0, sn_{t−1} + ((mean − x_t) − 0.5·std))
  * returning the full (sp, sn) path. A running recurrence is the frame
  * class neither window functions (no feedback) nor `aggregate` (final
  * state only) expresses per-step; the expression runs it as a single
  * imperative pass over an ALREADY-AGGREGATED series array — callers
  * hand it dimension-sized input (e.g. hourly counts: |series| grows
  * with the time span, never the corpus), so the per-row loop is
  * bounded regardless of data scale.
  *
  * The arithmetic is a fixed IEEE sequence (every op correctly
  * rounded, parenthesization pinned above) mirrored token-for-token by
  * the DuckDB recursive-CTE oracle, so the paths — and any threshold
  * compare downstream — are bit-identical cross-engine.
  */
case class CusumSeq(xs: Expression, mean: Expression, std: Expression)
    extends TernaryExpression {

  override def first: Expression = xs
  override def second: Expression = mean
  override def third: Expression = std

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("sp", DoubleType, nullable = false),
      StructField("sn", DoubleType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (xs.dataType, mean.dataType, std.dataType) match {
      case (ArrayType(DoubleType, false), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      // getDouble cannot represent a null slot (the holt_seq rule).
      case (ArrayType(DoubleType, true), DoubleType, DoubleType) =>
        TypeCheckResult.TypeCheckFailure(
          "cusum_seq requires array<double> with non-nullable elements")
      case other => TypeCheckResult.TypeCheckFailure(
        s"cusum_seq requires (array<double>, double, double), got $other")
    }

  override def nullSafeEval(xsV: Any, meanV: Any, stdV: Any): Any =
    CusumSeq.run(xsV.asInstanceOf[ArrayData],
      meanV.asInstanceOf[Double], stdV.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, m, s) => s"graft.functions.CusumSeq.run($x, $m, $s)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(xs = newFirst, mean = newSecond, std = newThird)
}

object CusumSeq {
  def run(xs: ArrayData, mean: Double, std: Double): ArrayData = {
    val n = xs.numElements()
    val out = new Array[Any](n)
    val slack = 0.5 * std
    var sp = 0.0
    var sn = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getDouble(i)
      sp = math.max(0.0, sp + ((x - mean) - slack))
      sn = math.max(0.0, sn + ((mean - x) - slack))
      out(i) = InternalRow(sp, sn)
      i += 1
    }
    new GenericArrayData(out)
  }

  def cusumSeq(xs: Column, mean: Column, std: Column): Column =
    ColumnBridge.column(CusumSeq(ColumnBridge.expression(xs),
      ColumnBridge.expression(mean), ColumnBridge.expression(std)))
}
