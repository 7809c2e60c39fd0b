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

/** `kmv_sketch(hash, k)`: a MERGEABLE k-minimum-values distinct-set
  * summary — the k smallest DISTINCT hash values seen, returned as an
  * ascending long array.
  *
  * This is the SET-ALGEBRA member of the sketch family (HLL ≈ one
  * distinct count; KMV/theta ≈ distinct counts you can UNION and
  * INTERSECT after the fact — Beyer et al. 2007, and the theta-sketch
  * form in Dasgupta et al. 2016): keep each set's k smallest hashes
  * and any pairwise overlap estimate is array arithmetic on two
  * k-length arrays, long after the corpus is gone. The buffer never
  * exceeds k longs on update OR merge, so map-side partial
  * aggregation holds at any corpus size.
  *
  * Unlike Misra-Gries, the retained multiset is ORDER-INDEPENDENT:
  * "k smallest distinct" is a commutative, associative fold, so the
  * sketch is bit-identical under any partitioning or merge order —
  * spec-pinned, and the reason the downstream overlap estimates sit
  * in deterministic (repartition-proof) columns.
  *
  * The input must already be a uniform hash (the caller applies
  * `xxhash64`); the aggregate only maintains order statistics of it.
  * With values uniform on [0, 2^63) (caller masks the sign bit), the
  * k-th smallest m estimates the set's distinct count as
  * (k-1) / (m / 2^63); below capacity the sketch IS the distinct
  * hash set and estimates degrade to exact counts.
  */
case class KmvSketch(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvSketch.Summary] {

  require(k >= 2, "kmv_sketch capacity must be >= 2 (the estimator divides by k-1)")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a long hash input, got $other")
  }

  override def createAggregationBuffer(): KmvSketch.Summary =
    new KmvSketch.Summary(k)

  override def update(s: KmvSketch.Summary, input: InternalRow): KmvSketch.Summary = {
    val v = hash.eval(input)
    if (v != null) s.offer(v.asInstanceOf[Long])
    s
  }

  override def merge(a: KmvSketch.Summary, b: KmvSketch.Summary): KmvSketch.Summary = {
    a.absorb(b)
    a
  }

  override def eval(s: KmvSketch.Summary): Any =
    new GenericArrayData(s.ascending())

  override def serialize(s: KmvSketch.Summary): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val vs = s.ascending()
    out.writeInt(vs.length)
    vs.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvSketch.Summary = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val s = new KmvSketch.Summary(k)
    val n = in.readInt()
    (0 until n).foreach(_ => s.offer(in.readLong()))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
}

object KmvSketch {

  /** The k smallest distinct longs seen so far. TreeSet keeps the
    * current maximum at `last()` for O(log k) bounded insert. */
  final class Summary(k: Int) {
    private val mins = new java.util.TreeSet[java.lang.Long]()

    def offer(h: Long): Unit = {
      if (mins.size < k) { mins.add(h); () }
      else if (h < mins.last() && !mins.contains(h)) {
        mins.add(h)
        mins.remove(mins.last())
        ()
      }
    }

    def absorb(other: Summary): Unit = {
      val it = other.mins.iterator()
      while (it.hasNext) offer(it.next())
    }

    def ascending(): Array[Long] = {
      val out = new Array[Long](mins.size)
      val it = mins.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }
  }

  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())
}
