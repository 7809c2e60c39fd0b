package graft

import java.nio.charset.StandardCharsets.UTF_8

import com.google.common.hash.Hashing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

/** Kernel-level oracles for the sketch expressions. */
class SketchesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("murmur128 matches guava murmur3_128 (h1 and h2) on random inputs") {
    val rng = new scala.util.Random(7)
    val tmp = new Array[Long](2)
    (1 to 300).foreach { _ =>
      val bytes = Array.fill(rng.nextInt(64))(rng.nextInt().toByte)
      Sketches.murmur128(bytes, tmp)
      val g = Hashing.murmur3_128().hashBytes(bytes).asBytes()
      def le(off: Int): Long =
        (0 until 8).map(i => (g(off + i) & 0xffL) << (8 * i)).reduce(_ | _)
      assert(tmp(0) === le(0) && tmp(1) === le(8))
    }
  }

  test("minhash signature similarity estimates Jaccard") {
    val sparkS = spark
    import sparkS.implicits._
    // Two sets with known Jaccard 50/150 ≈ 0.333.
    val a = (0 until 100).map(i => s"tok$i")
    val b = (50 until 200).map(i => s"tok$i")
    val df = Seq((1L, a), (2L, b)).toDF("id", "toks")
      .select(col("id"), Sketches.minhashSigs(col("toks"), 256).as("sig"))
    val sigs = df.orderBy("id").collect().map(_.getSeq[Long](1))
    val agree = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }
    val est = agree.toDouble / 256
    val trueJ = 50.0 / 200.0
    assert(math.abs(est - trueJ) < 0.1, s"minhash estimate $est vs $trueJ")
  }

  test("simhash: identical bags collide, small edits stay close, distinct far") {
    val sparkS = spark
    import sparkS.implicits._
    val base = (0 until 200).map(i => s"w$i")
    val near = base.updated(0, "CHANGED").updated(1, "ALSO")
    val far = (1000 until 1200).map(i => s"w$i")
    val df = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "toks")
      .select(col("id"), Sketches.simhash64(col("toks")).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === m(2L))
    assert(Sketches.hamming64(m(1L), m(3L)) <= 10)
    assert(Sketches.hamming64(m(1L), m(4L)) >= 15)
  }

  test("cosine_sim matches a driver-side computation on real embeddings") {
    val rows = graft.sources.Tables.embeddings(spark, sf)
      .limit(4).collect().map(_.getSeq[Float](1).toArray)
    val sparkS = spark
    import sparkS.implicits._
    val df = Seq((rows(0), rows(1)), (rows(2), rows(3)))
      .toDF("a", "b")
      .select(Sketches.cosineSim(col("a"), col("b")).as("cos"))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = df.collect().map(_.getDouble(0))
    assert(math.abs(got(0) - cos(rows(0), rows(1))) < 1e-9)
    assert(math.abs(got(1) - cos(rows(2), rows(3))) < 1e-9)
  }

  test("collect_set_limit matches collect_set below the cap, nulls above it") {
    val sparkS = spark
    import sparkS.implicits._
    // Group 'small' has 5 distinct members, 'big' has 50.
    val df = ((1 to 5).map(i => ("small", i.toLong)) ++
      (1 to 50).flatMap(i => Seq(("big", i.toLong), ("big", i.toLong))))
      .toDF("g", "id")
    val got = df.repartition(7).groupBy("g")
      .agg(graft.functions.CollectSetLimit.collectSetLimit(col("id"), 10).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(got("small") === Some((1L to 5L).toSeq))
    assert(got("big") === None, "over-limit group must evaluate to null")
  }

  test("sketch expressions compile under codegen (no interpreted fallback)") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = graft.dedup.Dedup.embedding(spark, sf).count()
      assert(n > 0)
      val m = graft.dedup.Dedup.simhash(spark, sf).count()
      assert(m >= 0)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("freq_sketch is exact below capacity, across a forced multi-partition merge") {
    val sparkS = spark
    import sparkS.implicits._
    val items = Seq.fill(30)("a") ++ Seq.fill(20)("b") ++ Seq.fill(10)("c") ++
      Seq.fill(3)("d") ++ Seq("e")
    val got = items.toDF("x").repartition(7)
      .agg(graft.functions.FreqSketch.freqSketch(col("x"), 10).as("s"))
      .selectExpr("inline(s)").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    // Distinct items ≤ capacity: no decrement ever fires, the summary
    // is the exact multiset regardless of merge order, sorted
    // (count desc, item asc).
    assert(got === Seq(("a", 30L), ("b", 20L), ("c", 10L), ("d", 3L), ("e", 1L)))
  }

  test("vocab sketch holds the Misra-Gries invariants against exact corpus counts") {
    val cap = 64
    // topK = capacity surfaces the whole summary for the guarantees.
    val rows = graft.text.Text.vocabSketch(spark, sf, cap, cap).collect()
    assert(rows.nonEmpty)
    val sketched = rows.map(_.getString(1)).toSet
    rows.foreach { r =>
      val (tok, under, bound) = (r.getString(1), r.getLong(4), r.getLong(5))
      assert(under >= 0L, s"$tok: stored count above the true count")
      assert(under <= bound, s"$tok: underestimate $under > err_bound $bound")
    }
    // Every true heavy hitter (count > n/(k+1)) MUST be present.
    val exact = graft.text.Text.tokenCounts(spark, sf)
      .select("token", "n_occurrences").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val nTotal = exact.map(_._2).sum
    exact.filter(_._2 > nTotal / (cap + 1)).foreach { case (tok, cnt) =>
      assert(sketched.contains(tok),
        s"guaranteed heavy hitter $tok ($cnt of $nTotal) missing from the sketch")
    }
  }
}
