package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Coarse-quantizer primitives for IVF-style ANN (SURVEY §2.5): assign
  * vectors to their nearest centroid(s) by cosine. The centroid table
  * is tiny (fit on a sample, driver-side) and ships inside the
  * expression via a codegen object reference — every row's assignment
  * is a plain static call over unboxed arrays, no joins, no UDFs.
  */
object Centroids {

  /** Driver-side spherical k-means on a (small) sample: deterministic
    * (fixed seed / fixed iterations), standard practice for fitting a
    * coarse quantizer — at 100 TB you fit on a 1e5 sample and assign
    * the corpus with the fitted centroids. */
  def fit(sample: Array[Array[Float]], k: Int, iters: Int, seed: Long): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample.head.length
    val rng = new java.util.Random(seed)
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    var cents = Array.fill(k)(
      normalize(sample(rng.nextInt(sample.length)).map(_.toDouble)))
    (1 to iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestOf(v, cents)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = sums.zipWithIndex.map { case (s, c) =>
        if (counts(c) == 0) cents(c) else normalize(s)
      }
    }
    cents
  }

  private def nearestOf(v: Array[Float], cents: Array[Array[Double]]): Int = {
    var best = 0; var bestDot = Double.MinValue
    var c = 0
    while (c < cents.length) {
      var dot = 0.0; var i = 0
      val cent = cents(c)
      while (i < v.length) { dot += v(i) * cent(i); i += 1 }
      if (dot > bestDot) { bestDot = dot; best = c }
      c += 1
    }
    best
  }

  /** The `nProbe` nearest centroid ids for a vector, best first.
    * (Cosine order == dot order because centroids are unit-norm.) */
  def nearestCentroids(v: ArrayData, cents: Array[Array[Double]], nProbe: Int): ArrayData = {
    val vf = v.toFloatArray()
    val norm = math.sqrt(vf.map(x => x.toDouble * x).sum)
    val dots = cents.indices.map { c =>
      var dot = 0.0; var i = 0
      val cent = cents(c)
      val n = math.min(vf.length, cent.length)
      while (i < n) { dot += vf(i) * cent(i); i += 1 }
      (if (norm == 0) 0.0 else dot / norm, c)
    }
    new GenericArrayData(
      dots.sortBy { case (d, c) => (-d, c) }.take(nProbe).map(_._2).toArray)
  }

  def nearestCentroids(c: Column, cents: Array[Array[Double]], nProbe: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(c), cents, nProbe))
}

/** `nearest_centroids(vec)`: the nProbe nearest centroid ids, best
  * first. The centroid matrix rides along as a codegen reference
  * object (broadcast-free: it is part of the plan). */
case class NearestCentroids(
    child: Expression, cents: Array[Array[Double]], nProbe: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires array<float>, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    Centroids.nearestCentroids(input.asInstanceOf[ArrayData], cents, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cents", cents, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Centroids.nearestCentroids($c, $ref, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
