package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `array_pairs(xs)`: string-array pair generation as ONE compiled
  * expression — `adjacent = true` yields the n−1 consecutive (bigram)
  * pairs, `false` all n·(n−1)/2 unordered combinations in index
  * order. Exists because Spark's higher-order functions (`transform` /
  * `slice` / `arrays_zip` composition) are evaluated INTERPRETED, one
  * closure dispatch per element — profiled at 3.7 s for the basket
  * pair explode at sf0.1 where this expression runs the same loop
  * compiled inside the scan's codegen stage. Callers bound the input
  * (an order's brand set, a document's token array), so the output is
  * ≤ |xs|² per row, never corpus-shaped.
  */
case class ArrayPairs(child: Expression, adjacent: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"array_pairs requires array<string>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    ArrayPairs.run(v.asInstanceOf[ArrayData], adjacent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ArrayPairs.run($c, $adjacent)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayPairs {
  def run(arr: ArrayData, adjacent: Boolean): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    if (adjacent) {
      val out = new Array[Any](n - 1)
      var i = 0
      while (i < n - 1) {
        out(i) = InternalRow(arr.getUTF8String(i), arr.getUTF8String(i + 1))
        i += 1
      }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](n * (n - 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          out(k) = InternalRow(arr.getUTF8String(i), arr.getUTF8String(j))
          k += 1
          j += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Consecutive (bigram) pairs of a string array. */
  def adjacentPairs(xs: Column): Column =
    ColumnBridge.column(ArrayPairs(ColumnBridge.expression(xs), adjacent = true))

  /** All unordered combinations of a string array, index order. */
  def combinations(xs: Column): Column =
    ColumnBridge.column(ArrayPairs(ColumnBridge.expression(xs), adjacent = false))
}
