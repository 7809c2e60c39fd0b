package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Codec for Cassandra counter-cell values: a counter shard's value is
  * a signed 64-bit big-endian integer (the reference reads it as a raw
  * longlong — SSTable.cpp:434-436 parses the counter header and the
  * value body follows the standard length-prefixed form). Decoding to
  * LongType is what lets the SUM-merge of shards run as a plain
  * map-side-combinable aggregation; the encode direction restores the
  * cell-bag's binary `value` so a summed counter rides the same export
  * schema as every other cell. Both directions are codegen'd static
  * calls — no UDF boxing on the migration hot path.
  */
object CounterCodec {

  /** Big-endian signed 64-bit decode. Loud on malformed widths: a
    * counter shard that isn't exactly 8 bytes is corrupt input, not a
    * zero. */
  def beLong(b: Array[Byte]): Long = {
    require(b != null && b.length == 8,
      s"counter value must be 8 bytes, got ${if (b == null) "null" else b.length}")
    java.nio.ByteBuffer.wrap(b).getLong
  }

  /** Big-endian signed 64-bit encode (inverse of [[beLong]]). */
  def longBe(v: Long): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(8)
    b.putLong(v)
    b.array()
  }

  def counterLong(c: Column): Column =
    ColumnBridge.column(CounterLong(ColumnBridge.expression(c)))
  def longBinary(c: Column): Column =
    ColumnBridge.column(LongBinary(ColumnBridge.expression(c)))
}

/** `counter_long(binary)`: 8-byte big-endian counter shard → long. */
case class CounterLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"counter_long requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CounterCodec.beLong(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CounterCodec.beLong($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `long_binary(long)`: long → 8-byte big-endian binary. */
case class LongBinary(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"long_binary requires long, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CounterCodec.longBe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CounterCodec.longBe($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
