package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `freq_sketch(item, k)`: a MERGEABLE Misra-Gries heavy-hitters
  * summary — at most k (item, count) counters per buffer, returned
  * sorted (count desc, item asc).
  *
  * This is the frequency member of the sketch family (HLL ≈ distinct,
  * approx_percentile ≈ quantiles): the bounded-memory summary that
  * replaces an exact vocabulary-sized count table when even the
  * vocabulary is too large — the buffer NEVER exceeds k counters, on
  * update or on merge, so map-side partial aggregation holds at any
  * corpus size.
  *
  * Update is the classic Frequent step (hit → +1; free slot → insert;
  * full → decrement every counter, dropping zeros); merge is the
  * mergeable-summaries form (Agarwal et al. 2012): add counters
  * pairwise, then subtract the (k+1)-th largest count from all and
  * drop the non-positive. Both preserve the Misra-Gries invariants,
  * under ANY merge order: a stored count never exceeds the true
  * count, every item with true count > n/(k+1) is present, and the
  * undercount of any item is at most (n - S)/(k+1), where n is the
  * stream length and S the sum of stored counts — the bound a
  * consumer can self-report from the sketch alone. The stored
  * MULTISET may vary with merge order (only within those bounds), so
  * consumers assert the invariants, not a fixed rendition.
  */
case class FreqSketch(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[FreqSketch.Summary] {

  require(k >= 1, "freq_sketch capacity must be >= 1")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_sketch requires a string item, got $other")
  }

  override def createAggregationBuffer(): FreqSketch.Summary =
    new FreqSketch.Summary(k)

  override def update(s: FreqSketch.Summary, input: InternalRow): FreqSketch.Summary = {
    val v = item.eval(input)
    if (v != null) s.offer(v.asInstanceOf[UTF8String].toString)
    s
  }

  override def merge(a: FreqSketch.Summary, b: FreqSketch.Summary): FreqSketch.Summary = {
    a.absorb(b)
    a
  }

  override def eval(s: FreqSketch.Summary): Any =
    new GenericArrayData(s.sorted().map { case (i, c) =>
      InternalRow(UTF8String.fromString(i), c)
    }.toArray[Any])

  // Length-prefixed UTF-8, not writeUTF: the sketch is registered over
  // arbitrary strings and writeUTF throws past 64 KiB — the
  // bounded-memory aggregate must survive any item.
  override def serialize(s: FreqSketch.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = s.sorted()
    out.writeInt(entries.length)
    entries.foreach { case (i, c) =>
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqSketch.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new FreqSketch.Summary(k)
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      s.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
    }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(item = newChildren(0))
}

object FreqSketch {

  /** ≤ k counters; all operations keep the Misra-Gries invariants. */
  final class Summary(k: Int) {
    private val counters = new java.util.HashMap[String, Long]()

    /** Direct insert for deserialization (counts from a valid
      * summary, so size stays ≤ k by construction). */
    private[FreqSketch] def put(item: String, count: Long): Unit =
      counters.put(item, count)

    def offer(item: String): Unit = {
      val c = counters.get(item)
      if (c != 0L) counters.put(item, c + 1L)
      else if (counters.size < k) counters.put(item, 1L)
      else decrementAll(1L)
    }

    def absorb(other: Summary): Unit = {
      other.counters.forEach { (i, c) =>
        counters.put(i, counters.get(i) + c) // absent unboxes to 0
      }
      if (counters.size > k) {
        // Subtract the (k+1)-th largest stored count from everything.
        val values = new Array[Long](counters.size)
        var n = 0
        counters.forEach { (_, c) => values(n) = c; n += 1 }
        java.util.Arrays.sort(values)
        decrementAll(values(values.length - k - 1))
      }
    }

    private def decrementAll(by: Long): Unit = {
      val it = counters.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
      }
    }

    def sorted(): Seq[(String, Long)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      counters.forEach { (i, c) => buf += ((i, c)) }
      buf.sortBy { case (i, c) => (-c, i) }.toSeq
    }
  }

  def freqSketch(item: Column, k: Int): Column =
    ColumnBridge.column(
      FreqSketch(ColumnBridge.expression(item), k).toAggregateExpression())
}
