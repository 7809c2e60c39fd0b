package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Element access for FROZEN Cassandra collections.
  *
  * A frozen `list`/`set`/`map` is stored (and migrated) as ONE opaque
  * blob cell — that is Cassandra's own semantics (frozen values
  * compare as bytes) and what the SSTable reader emits, so the migrate
  * path is already correct. What a consumer of the migrated data still
  * needs is ELEMENT access, and the wire layout inside the blob is
  * Cassandra's public CollectionSerializer form (protocol v3+): a
  * 4-byte big-endian element count, then per element a 4-byte length
  * (-1 = null) and the raw bytes; maps interleave key and value. These
  * expressions decode that layout post-scan — `explode(
  * frozen_list_elements(value))` turns a migrated frozen list into
  * rows — with loud failure on malformed bytes (a wrong count or a
  * truncated element means the blob is NOT a frozen collection, and
  * silently returning partial elements would corrupt downstream
  * counts). Codegen'd static calls, no UDF boxing.
  */
object FrozenCollections {

  private def readElement(buf: java.nio.ByteBuffer, what: String): Array[Byte] = {
    val len = buf.getInt
    if (len < 0) {
      require(len == -1, s"implausible frozen $what length $len")
      null
    } else {
      require(len <= buf.remaining,
        s"frozen $what length $len exceeds remaining ${buf.remaining} bytes")
      val e = new Array[Byte](len)
      buf.get(e)
      e
    }
  }

  /** Frozen list/set blob → element byte arrays, in stored order. */
  def listElements(b: Array[Byte]): ArrayData = {
    val buf = java.nio.ByteBuffer.wrap(b)
    require(buf.remaining >= 4, s"frozen collection shorter than its count header")
    val n = buf.getInt
    require(n >= 0 && n.toLong * 4 <= buf.remaining,
      s"implausible frozen collection count $n for ${buf.remaining} bytes")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = readElement(buf, "element"); i += 1 }
    require(!buf.hasRemaining,
      s"${buf.remaining} trailing bytes after frozen collection")
    new GenericArrayData(out)
  }

  /** Frozen map blob → (key, value) byte-array structs, stored order. */
  def mapEntries(b: Array[Byte]): ArrayData = {
    val buf = java.nio.ByteBuffer.wrap(b)
    require(buf.remaining >= 4, s"frozen map shorter than its count header")
    val n = buf.getInt
    require(n >= 0 && n.toLong * 8 <= buf.remaining,
      s"implausible frozen map count $n for ${buf.remaining} bytes")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val k = readElement(buf, "key")
      val v = readElement(buf, "value")
      out(i) = new GenericInternalRow(Array[Any](k, v))
      i += 1
    }
    require(!buf.hasRemaining, s"${buf.remaining} trailing bytes after frozen map")
    new GenericArrayData(out)
  }

  def frozenListElements(c: Column): Column =
    ColumnBridge.column(FrozenListElements(ColumnBridge.expression(c)))
  def frozenMapEntries(c: Column): Column =
    ColumnBridge.column(FrozenMapEntries(ColumnBridge.expression(c)))
}

/** `frozen_list_elements(binary)`: array<binary> of the frozen
  * list/set's elements (null elements preserved). */
case class FrozenListElements(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frozen_list_elements requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    FrozenCollections.listElements(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrozenCollections.listElements($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `frozen_map_entries(binary)`: array<struct<key binary, value binary>>
  * of the frozen map's entries. */
case class FrozenMapEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"frozen_map_entries requires binary, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    FrozenCollections.mapEntries(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrozenCollections.mapEntries($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
