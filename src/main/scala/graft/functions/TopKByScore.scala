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

/** `topk_by_score(score, id, k)`: the k highest-scoring (score, id)
  * pairs of a group, best first, ties broken by ascending id.
  *
  * This is the scale-correct top-k: a bounded k-element heap per group
  * with map-side partial aggregation, so scoring a 100 TB corpus
  * against a query never sorts the corpus — each partition reduces to
  * k rows before the shuffle, and the merge is O(k log k). The window
  * `row_number` formulation it replaces sorts every group in full.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKByScore.Heap] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"topk_by_score requires (double, bigint), got $other")
    }

  override def createAggregationBuffer(): TopKByScore.Heap = new TopKByScore.Heap(k)

  override def update(h: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) h.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    h
  }

  override def merge(a: TopKByScore.Heap, b: TopKByScore.Heap): TopKByScore.Heap = {
    b.foreach(a.offer)
    a
  }

  override def eval(h: TopKByScore.Heap): Any = {
    val rows = h.sortedBestFirst().map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(h: TopKByScore.Heap): Array[Byte] = {
    val entries = h.sortedBestFirst()
    val bb = ByteBuffer.allocate(4 + entries.length * 16)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s).putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new TopKByScore.Heap(k)
    (0 until n).foreach(_ => h.offer(bb.getDouble, bb.getLong))
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {

  /** Bounded k-best heap; the java PQ keeps the WORST entry at its
    * head so eviction is O(log k). Order: higher score better, lower
    * id breaks ties. */
  final class Heap(k: Int) {
    private val pq = new java.util.PriorityQueue[(Double, Long)](
      math.max(k, 1),
      (a: (Double, Long), b: (Double, Long)) => {
        val c = java.lang.Double.compare(a._1, b._1) // lowest score first
        if (c != 0) c else java.lang.Long.compare(b._2, a._2) // highest id first
      })

    def offer(s: Double, i: Long): Unit = {
      pq.offer((s, i))
      if (pq.size() > k) pq.poll()
    }

    def foreach(f: (Double, Long) => Unit): Unit =
      pq.iterator().forEachRemaining(e => f(e._1, e._2))

    def sortedBestFirst(): Seq[(Double, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
      pq.iterator().forEachRemaining(buf += _)
      buf.sortBy { case (s, i) => (-s, i) }.toSeq
    }
  }

  def topkByScore(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
