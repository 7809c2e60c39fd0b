package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** `collect_set_limit(key, limit)`: collect the distinct long keys of a
  * group as a SORTED array, or NULL as soon as the group exceeds
  * `limit` distinct members.
  *
  * This is the bounded-memory form of `collect_set` for LSH bucket
  * aggregation: a degenerate bucket (a stop-shingle posting list, a
  * zero-vector hyperplane bucket) at 100 TB would otherwise accumulate
  * millions of members in one aggregation buffer before a downstream
  * size filter could drop it. Here the buffer stops growing at
  * limit+1 — an overflowing bucket costs O(limit) memory and evaluates
  * to NULL, which the caller filters out. Same results as
  * `filter(size(collect_set(..)) <= limit)`, but with a hard per-group
  * memory bound.
  */
case class CollectSetLimit(
    child: Expression,
    limit: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CollectSetLimit.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"collect_set_limit requires bigint input, got $other")
  }

  override def createAggregationBuffer(): CollectSetLimit.Buf =
    new CollectSetLimit.Buf(new java.util.HashSet[Long](), false)

  override def update(buf: CollectSetLimit.Buf, input: InternalRow): CollectSetLimit.Buf = {
    if (!buf.overflow) {
      val v = child.eval(input)
      if (v != null) {
        buf.set.add(v.asInstanceOf[Long])
        if (buf.set.size() > limit) { buf.overflow = true; buf.set.clear() }
      }
    }
    buf
  }

  override def merge(a: CollectSetLimit.Buf, b: CollectSetLimit.Buf): CollectSetLimit.Buf = {
    if (a.overflow || b.overflow) { a.overflow = true; a.set.clear() }
    else {
      val it = b.set.iterator()
      while (it.hasNext && !a.overflow) {
        a.set.add(it.next())
        if (a.set.size() > limit) { a.overflow = true; a.set.clear() }
      }
    }
    a
  }

  override def eval(buf: CollectSetLimit.Buf): Any =
    if (buf.overflow) null
    else {
      val arr = new Array[Long](buf.set.size())
      val it = buf.set.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next(); i += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buf: CollectSetLimit.Buf): Array[Byte] = {
    if (buf.overflow) Array[Byte](1)
    else {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.set.size())
      bb.put(0.toByte).putInt(buf.set.size())
      val it = buf.set.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }
  }

  override def deserialize(bytes: Array[Byte]): CollectSetLimit.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == 1.toByte) new CollectSetLimit.Buf(new java.util.HashSet[Long](), true)
    else {
      val n = bb.getInt
      val set = new java.util.HashSet[Long](n * 2)
      var i = 0
      while (i < n) { set.add(bb.getLong); i += 1 }
      new CollectSetLimit.Buf(set, false)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetLimit =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetLimit =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object CollectSetLimit {
  /** Aggregation state: the distinct members so far, or overflow. */
  final class Buf(val set: java.util.HashSet[Long], var overflow: Boolean)

  def collectSetLimit(c: Column, limit: Int): Column =
    ColumnBridge.column(
      CollectSetLimit(ColumnBridge.expression(c), limit).toAggregateExpression())
}
