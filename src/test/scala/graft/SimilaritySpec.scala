package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.Similarity
import graft.sources.Tables

/** Oracles for the ANN operators: driver-side brute force on sf0.001. */
class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val vectors: Map[Long, Array[Float]] =
    Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    (a.indices).foreach { i =>
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
    }
    dot / math.sqrt(na * nb)
  }

  private def trueTopK(queryId: Long, k: Int): Seq[Long] = {
    val q = vectors(queryId)
    vectors.toSeq.filter(_._1 != queryId)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(k).map(_._1)
  }

  test("brute-force top-k matches the driver-side oracle exactly") {
    val got = Similarity.bruteForceTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(got.keySet === (0L until 10L).toSet)
    got.foreach { case (q, ids) =>
      assert(ids === trueTopK(q, 10), s"query $q top-k mismatch")
    }
  }

  test("filtered top-k searches only the query's label slice, exactly") {
    val labels: Map[Long, Int] = Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(2)).toMap
    def trueFilteredTopK(queryId: Long, k: Int): Seq[Long] = {
      val q = vectors(queryId)
      vectors.toSeq
        .filter { case (id, _) => id != queryId && labels(id) == labels(queryId) }
        .map { case (id, v) => (id, cos(q, v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(k).map(_._1)
    }
    val rows = Similarity.filteredTopK(spark, sf).collect()
    rows.foreach { r =>
      assert(labels(r.getLong(1)) === labels(r.getLong(0)),
        s"result ${r.getLong(1)} outside query ${r.getLong(0)}'s label slice")
    }
    val got = rows.groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq }
    assert(got.keySet === (0L until 10L).toSet)
    got.foreach { case (q, ids) =>
      assert(ids === trueFilteredTopK(q, 10), s"query $q filtered top-k mismatch")
    }
  }

  test("emb_kmeans recovers planted clusters exactly and is repartition-proof") {
    import spark.implicits._
    import graft.similarity.Kmeans
    // Three well-separated unit directions + small deterministic noise:
    // any correct spherical k-means must recover the partition exactly.
    val dim = 16
    val rng = new scala.util.Random(7)
    val dirs = Seq(0, 5, 11).map { axis =>
      val v = new Array[Float](dim); v(axis) = 1.0f; v
    }
    val rows = (0 until 150).map { i =>
      val base = dirs(i % 3)
      val noisy = base.indices.map(j => base(j) + (rng.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, noisy.toArray)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    val out = Kmeans.kmeansOn(emb, k = 3, rounds = 4).collect()
    assert(out.length === 3)
    assert(out.map(_.getAs[Long]("n_points")).sum === 150L)
    out.foreach { r =>
      assert(r.getAs[Long]("n_points") === 50L,
        s"planted 50/50/50 partition not recovered: $r")
      assert(r.getAs[Double]("mean_cos") > 0.99, s"tight cluster expected: $r")
      assert(r.getAs[Double]("min_cos") > 0.95, s"no straggler members: $r")
      val share = r.getAs[Double]("share")
      assert(math.abs(share - 1.0 / 3) < 0.001)
    }
    // Quantized-integer moments make every round exact under any
    // partitioning — the whole fit must be bit-identical.
    val again = Kmeans.kmeansOn(emb.repartition(13), k = 3, rounds = 4).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("seeded trainer: planted recovery, unit-norm seeds, repartition/order-proof") {
    import spark.implicits._
    import graft.similarity.Kmeans
    // The adaptive-k trainer (kNN quantizer, dedup_semantic): hash-
    // ordered Forgy seeds + full-corpus Lloyd rounds. Same planted
    // three-direction geometry as the emb_kmeans spec — the fit must
    // recover the partition — plus the properties the seeding adds:
    // k distinct unit-norm seeds, and bit-identical centroids under
    // repartitioning AND row-order shuffling (the seed rule is
    // key-derived, not position-derived).
    val dim = 16
    val rng = new scala.util.Random(11)
    val dirs = Seq(1, 7, 13).map { axis =>
      val v = new Array[Float](dim); v(axis) = 1.0f; v
    }
    val rows = (0 until 120).map { i =>
      val base = dirs(i % 3)
      val noisy = base.indices.map(j => base(j) + (rng.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, noisy.toArray)
    }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))

    val seeds = Kmeans.hashSeeds(emb, 3, "#spec")
    assert(seeds.length === 3)
    assert(seeds.map(_.toSeq).distinct.length === 3)
    seeds.foreach { s =>
      assert(math.abs(math.sqrt(s.map(x => x * x).sum) - 1.0) < 1e-12,
        "seed not unit-normalized")
    }
    intercept[IllegalArgumentException](Kmeans.hashSeeds(emb, 121, "#spec"))

    val cents = Kmeans.fittedCentroidsSeeded(emb, 3, rounds = 4, salt = "#spec")
    val byCluster = Kmeans.assignedTo(emb, cents).collect()
      .groupBy(_.getAs[Int]("cluster"))
    assert(byCluster.size === 3)
    byCluster.values.foreach(members => assert(members.length === 40,
      "planted 40/40/40 partition not recovered"))
    // Each planted direction owns exactly one cluster.
    byCluster.values.foreach { members =>
      val mods = members.map(_.getAs[Long]("vec_id") % 3).distinct
      assert(mods.length === 1, "a cluster mixes planted directions")
    }
    val again = Kmeans
      .fittedCentroidsSeeded(emb.repartition(13), 3, rounds = 4, salt = "#spec")
    assert(cents.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq,
      "fit not repartition-proof")
    val shuffled = Kmeans.fittedCentroidsSeeded(
      emb.orderBy(org.apache.spark.sql.functions.md5(col("vec_id").cast("string"))),
      3, rounds = 4, salt = "#spec")
    assert(cents.map(_.toSeq).toSeq === shuffled.map(_.toSeq).toSeq,
      "fit not row-order-proof")
  }

  test("emb_label_purity: planted label mixes give exact majority, tie label ASC (r13)") {
    import spark.implicits._
    import graft.similarity.Kmeans
    // Same separable geometry as the kmeans spec, but with planted
    // labels per cluster: pure / 80-20 majority / exact 50-50 tie.
    val dim = 16
    val rng = new scala.util.Random(7)
    val dirs = Seq(0, 5, 11).map { axis =>
      val v = new Array[Float](dim); v(axis) = 1.0f; v
    }
    val rows = (0 until 150).map { i =>
      val base = dirs(i % 3)
      val noisy = base.indices.map(j => base(j) + (rng.nextFloat() - 0.5f) * 0.1f)
      val label = (i % 3, (i / 3) % 50) match {
        case (0, _)           => "A"            // pure cluster
        case (1, r) if r < 40 => "B"            // 40 B + 10 C
        case (1, _)           => "C"
        case (2, r) if r < 25 => "C"            // exact 25/25 tie
        case (2, _)           => "B"
      }
      (i.toLong, noisy.toArray, label)
    }
    val tmp = java.nio.file.Files.createTempDirectory("purityfix").toString
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")

    val out = Kmeans.labelPurity(spark, tmp, k = 3, rounds = 4).collect()
      .map(r => r.getAs[String]("top_label") -> r)
    assert(out.length === 3)
    assert(out.map(_._2.getAs[Long]("n_points")).sum === 150L)
    val byShape = out.map { case (top, r) =>
      (r.getAs[Long]("n_labels"), top, r.getAs[Long]("n_top"),
        r.getAs[Double]("purity"))
    }.toSet
    assert(byShape === Set(
      (1L, "A", 50L, 1.0),   // pure
      (2L, "B", 40L, 0.8),   // majority
      (2L, "B", 25L, 0.5)),  // 50-50 tie -> label ASC picks B over C
      s"planted purities not recovered: ${byShape.mkString("; ")}")
  }

  test("emb_kmeans on the corpus: total coverage, valid audit columns") {
    val out = graft.similarity.Kmeans.embKmeans(spark, sf).collect()
    val total = Tables.embeddings(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_points")).sum === total,
      "every vector lands in exactly one cluster")
    out.foreach { r =>
      assert(r.getAs[Long]("n_points") > 0)
      val (mean, mn) = (r.getAs[Double]("mean_cos"), r.getAs[Double]("min_cos"))
      assert(mean >= mn && mean <= 1.0 && mn >= -1.0)
    }
  }

  test("LSH top-k achieves reasonable recall against exact top-k") {
    val got = Similarity.lshTopK(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    assert(got.keySet === (0L until 10L).toSet, "every query returns candidates")
    val recalls = got.map { case (q, ids) =>
      val truth = trueTopK(q, 10).toSet
      (ids & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // Random Gaussian corpus is the worst case for LSH (no cluster
    // structure); 8 tables x 10 bits on 500 vectors still recovers a
    // meaningful fraction of the true neighbors.
    assert(mean >= 0.25, s"mean recall@10 too low: $mean")
  }

  test("reported recall_at_k column matches independently computed recall") {
    Seq(Similarity.lshTopK(spark, sf), Similarity.ivfTopK(spark, sf)).foreach { df =>
      val rows = df.collect()
      rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
        val truth = trueTopK(q, 10).toSet
        val want = (rs.map(_.getAs[Long]("vec_id")).toSet & truth).size.toDouble / 10
        val reported = rs.map(_.getAs[Double]("recall_at_k")).distinct
        assert(reported.length == 1, s"query $q: recall not constant per query")
        assert(reported.head === want, s"query $q: reported ${reported.head}, want $want")
      }
    }
  }

  test("LSH candidates are a small fraction of the corpus (pruning works)") {
    val nCand = Similarity.lshTopK(spark, sf).count()
    assert(nCand <= 10 * 10, "at most k per query")
  }

  test("IVF top-k probes inverted lists and achieves reasonable recall") {
    val rows = Similarity.ivfTopK(spark, sf).collect()
    val byQuery = rows.groupBy(r => r.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    assert(byQuery.keySet === (0L until 10L).toSet)
    val recalls = byQuery.map { case (q, ids) =>
      val truth = trueTopK(q, 10).toSet
      (ids & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // nProbe=4 of 16 lists touches ~25% of a clusterless corpus.
    assert(mean >= 0.25, s"IVF mean recall@10 too low: $mean")
    // Every query returns exactly k ranked candidates.
    assert(rows.groupBy(_.getAs[Long]("query_id")).values.forall(_.length == 10))
  }

  test("emb_outliers: planted geometry gets the exact centroid cosines") {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("embfix").toString
    // label 0: two copies of e1 -> centroid e1, cos 1.0 for both.
    // label 1: e1 and e2 -> centroid (.5, .5), cos = 1/sqrt(2) each.
    Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 1),
      (3L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.embOutliers(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Double]("cos_centroid") === 1.0)
    assert(got(1L).getAs[Double]("cos_centroid") === 1.0)
    assert(got(2L).getAs[Double]("cos_centroid") === 0.707107)
    assert(got(3L).getAs[Double]("cos_centroid") === 0.707107)
    assert(got.values.forall(!_.getAs[Boolean]("is_outlier")))
  }

  test("PQ top-k: ADC shortlist + exact re-rank achieves reasonable recall") {
    val rows = Similarity.pqTopK(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === (0L until 10L).toSet)
    // Every query returns exactly k rows, ranked 1..k.
    byQuery.values.foreach { rs =>
      assert(rs.length === 10)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10))
    }
    // The emitted cosines are EXACT (re-ranked on raw vectors): each
    // must match the brute-force cosine for that (query, candidate).
    rows.take(50).foreach { r =>
      val q = r.getAs[Long]("query_id")
      val v = r.getAs[Long]("vec_id")
      val want = cos(vectors(q), vectors(v))
      assert(math.abs(r.getAs[Double]("cos") - want) < 1e-12,
        s"($q,$v): re-ranked cos must be exact")
    }
    // 8 blocks x 16 codewords on a random Gaussian corpus (PQ's worst
    // case: no cluster structure) with a 50-deep re-rank shortlist.
    val recalls = byQuery.map { case (q, rs) =>
      val truth = trueTopK(q, 10).toSet
      (rs.map(_.getAs[Long]("vec_id")).toSet & truth).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.25, s"PQ mean recall@10 too low: $mean")
  }

  test("IVF-PQ top-k: routed ADC + exact re-rank, candidates within probed lists") {
    val rows = Similarity.ivfPqTopK(spark, sf).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet === (0L until 10L).toSet)
    byQuery.values.foreach { rs =>
      assert(rs.length === 10)
      assert(rs.map(_.getAs[Int]("rank")).sorted.sameElements(1 to 10))
    }
    // Re-ranked cosines are exact raw-vector cosines.
    rows.take(50).foreach { r =>
      val q = r.getAs[Long]("query_id")
      val v = r.getAs[Long]("vec_id")
      assert(math.abs(r.getAs[Double]("cos") - cos(vectors(q), vectors(v))) < 1e-12)
    }
    // Composition sanity: every returned candidate must sit in one of
    // the query's nProbe=4 probed lists — i.e. IVF-PQ's result set is
    // a subset of plain IVF's candidate universe, so its recall can
    // never exceed IVF's. Compare per query against the standalone IVF
    // result (same coarse quantizer, exact scoring): on this corpus
    // the PQ approximation may reorder the shortlist but both see the
    // same routed candidates.
    val ivf = Similarity.ivfTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val ivfRecall = ivf.map { case (q, rs) => q -> rs.head.getAs[Double]("recall_at_k") }
    byQuery.foreach { case (q, rs) =>
      assert(rs.head.getAs[Double]("recall_at_k") <= ivfRecall(q) + 1e-9,
        s"query $q: IVF-PQ recall cannot exceed its routing's")
    }
    // Recall floor: a regression tripwire on the clusterless Gaussian
    // corpus (ANN's worst case), under the IVF floor since PQ
    // approximates within the same routed lists.
    val mean = byQuery.values
      .map(_.head.getAs[Double]("recall_at_k")).sum / byQuery.size
    assert(mean >= 0.10, s"IVF-PQ mean recall@10 too low: $mean")
  }

  test("ann_tuning_curve: recall and candidate volume grow monotonically in nProbe") {
    val rows = Similarity.ivfTuningCurve(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("n_probe")).toSeq === Seq(1, 2, 4, 8))
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    val cands = rows.map(_.getAs[Long]("n_candidates"))
    val fracs = rows.map(_.getAs[Double]("cand_frac"))
    // More probed lists can only add candidates — both axes of the
    // trade-off curve are monotone.
    assert(cands.sliding(2).forall(w => w(0) <= w(1)), cands.mkString(","))
    assert(recalls.sliding(2).forall(w => w(0) <= w(1) + 1e-9), recalls.mkString(","))
    assert(fracs.forall(f => f > 0.0 && f < 1.0))
    // The p=4 point IS ivf_topk's operating point: its recall must
    // equal the mean of the standalone operator's per-query recalls
    // (same fit, same probes, same truth) up to the two presentations'
    // rounding (per-query /10 averaged vs pooled ratio4 over 100).
    val ivfMean = Similarity.ivfTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map(_._2.head.getAs[Double]("recall_at_k")).sum / 10.0
    val p4 = rows.find(_.getAs[Int]("n_probe") === 4).get.getAs[Double]("recall_at_10")
    assert(math.abs(p4 - ivfMean) < 1e-9, s"p=4 recall $p4 != ivf mean $ivfMean")
    // Tripwire floor at full probe depth.
    assert(recalls.last >= 0.2, s"recall@10 at nProbe=8 too low: ${recalls.last}")
  }

  test("emb_quantize: planted vectors quantize exactly; corpus bounds hold") {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("embq").toString
    // v0: max|x| = 2.54 -> scale .02, elements quantize losslessly
    //     (127, -50, 0) -> cos exactly 1, max_abs_err 0.
    // v1: zero vector -> unit scale, null cosine, zero error.
    Seq(
      (0L, Array(2.54f, -1.0f, 0.0f), 0),
      (1L, Array(0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = Similarity.embQuantize(spark, tmp).collect()
      .map(r => r.getLong(0) -> r).toMap
    val s0 = got(0L).getAs[Double]("scale")
    assert(math.abs(s0 - 2.54f.toDouble / 127.0) < 1e-18)
    assert(got(0L).getAs[Double]("cos_dequant") === 1.0)
    assert(got(0L).getAs[Double]("max_abs_err") <= s0 / 2)
    assert(got(1L).getAs[Double]("scale") === 1.0)
    assert(got(1L).isNullAt(got(1L).fieldIndex("cos_dequant")))
    assert(got(1L).getAs[Double]("max_abs_err") === 0.0)

    // Corpus: one row per vector; SQ8 error bound max_abs_err <= scale/2
    // everywhere; reconstruction cosine stays high for random 64-dim
    // vectors; deterministic across runs.
    val rows = Similarity.embQuantize(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === n)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_dims") === 64)
      val sc = r.getAs[Double]("scale")
      assert(r.getAs[Double]("max_abs_err") <= sc / 2 * (1 + 1e-12),
        s"vec ${r.getLong(0)}: err beyond scale/2")
      val c = r.getAs[Double]("cos_dequant")
      assert(c > 0.99 && c <= 1.0, s"vec ${r.getLong(0)}: cos_dequant $c")
    }
    val again = Similarity.embQuantize(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("ANN recall floors hold at the driver-gate scale (sf0.01)") {
    // The driver's rows-only gate records recall_at_k but asserts
    // nothing — these floors catch a kernel regression that would
    // silently zero the column. Floors sit well under current measured
    // recall at sf0.01 (LSH ≈ 0.22 on this clusterless Gaussian corpus
    // — ANN's worst case); they are regression tripwires, not quality
    // targets.
    val dir = "/root/testdata/sf0.01"
    Seq(
      ("lsh", Similarity.lshTopK(spark, dir), 0.15),
      ("ivf", Similarity.ivfTopK(spark, dir), 0.15),
      ("pq", Similarity.pqTopK(spark, dir), 0.15)).foreach {
      case (name, df, floor) =>
        val perQuery = df.groupBy(col("query_id"))
          .agg(first(col("recall_at_k")).as("r")).collect().map(_.getDouble(1))
        val mean = perQuery.sum / perQuery.length
        assert(mean >= floor, s"$name mean recall@10 at sf0.01: $mean < $floor")
    }
  }

  test("emb_outliers on the corpus: bounded cosines, deterministic, total") {
    val rows = Similarity.embOutliers(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.length.toLong === n, "one row per vector")
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_centroid")
      assert(c >= -1.0 && c <= 1.0, s"cos out of range: $c")
      assert(r.getAs[Boolean]("is_outlier") === (c < 0))
    }
    val again = Similarity.embOutliers(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("emb_dim_stats: planted collapsed and known dims get exact stats") {
    import spark.implicits._
    val dir = "/tmp/graft-test-dimstats"
    // dim 0: constant 0.5 (collapsed); dim 1: alternating ±1 (mean 0,
    // std 1); dim 2: ramp i/n.
    val n = 64
    (0 until n).map { i =>
      (i.toLong, Array(0.5f, if (i % 2 == 0) 1f else -1f, i.toFloat / n), 0)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.embDimStats(spark, dir).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(rows.keySet === Set(0, 1, 2))
    val d0 = rows(0)
    assert(d0.getAs[Boolean]("collapsed"), "constant dim must flag collapsed")
    assert(d0.getAs[Double]("dim_mean") === 0.5 && d0.getAs[Double]("dim_std") === 0.0)
    assert(d0.getAs[Double]("dim_min") === 0.5 && d0.getAs[Double]("dim_max") === 0.5)
    val d1 = rows(1)
    assert(!d1.getAs[Boolean]("collapsed"))
    assert(d1.getAs[Double]("dim_mean") === 0.0 && d1.getAs[Double]("dim_std") === 1.0)
    val d2 = rows(2)
    assert(d2.getAs[Double]("dim_min") === 0.0)
    assert(math.abs(d2.getAs[Double]("dim_mean") - (n - 1) / (2.0 * n)) < 1e-4)
    // Determinism under different partitionings (the order-free fold).
    val again = Similarity.embDimStats(spark, dir).collect().map(_.toString).sorted
    assert(again.sameElements(
      Similarity.embDimStats(spark, dir).repartition(7).collect().map(_.toString).sorted))
    // The corpus table works too and reports every dimension once.
    assert(Similarity.embDimStats(spark, sf).count() === 64)
  }

  test("range search returns exactly the neighbors above the cosine floor") {
    val tau = 0.3
    val got = Similarity.rangeSearch(spark, sf, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      q <- 0L until 10L
      (id, v) <- vectors.toSeq if id != q
      if cos(vectors(q), v) >= tau
    } yield (q, id)).toSet
    assert(got === want)
    assert(got.nonEmpty, "corpus should contain neighbors above the floor")
  }

  test("emb_pca: moment pass matches a driver fold; spectrum invariants hold") {
    val rows = graft.similarity.Pca.embPca(spark, sf).collect()
    assert(rows.length === 16)
    // Spectrum invariants: descending non-negative eigenvalues, cum
    // ratio monotone and bounded, orthonormal retained basis.
    val ev = rows.map(_.getAs[Double]("eigenvalue"))
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b - 1e-12 })
    assert(ev.forall(_ >= 0.0))
    val cum = rows.map(_.getAs[Double]("cum_ratio"))
    assert(cum.zip(cum.tail).forall { case (a, b) => b >= a - 1e-12 })
    assert(cum.last <= 1.0 + 1e-9)
    assert(rows.head.getAs[Double]("ortho_err") < 1e-8)
    val eff = rows.head.getAs[Double]("effective_rank")
    assert(eff >= 1.0 && eff <= 64.0)
    // The distributed moment fold vs an exact driver-side covariance:
    // same Jacobi on both sides, so any drift is the aggregation's.
    val vs = vectors.values.toArray
    val n = vs.length
    val dim = vs.head.length
    val mean = Array.tabulate(dim)(d => vs.map(_(d).toDouble).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      vs.map(v => v(i).toDouble * v(j).toDouble).sum / n - mean(i) * mean(j)
    }
    val (evd, _) = graft.similarity.Pca.jacobiEigen(cov)
    rows.zipWithIndex.foreach { case (r, c) =>
      assert(math.abs(r.getAs[Double]("eigenvalue") - evd(c)) <=
        1e-6 * math.max(1.0, math.abs(evd(c))),
        s"component $c eigenvalue drift")
    }
    assert(math.abs(rows.head.getAs[Double]("total_variance") -
      (0 until dim).map(d => cov(d)(d)).sum) < 1e-6)
  }

  /** Deterministic rank-3 fixture (variance 9 along dim 1, 1 along
    * dim 5, 0.01 along dim 3; no RNG — session replay safety) written
    * to a FRESH temp dir per call, so no test depends on another's
    * ordering or on stale /tmp state, and the per-(session, dir) fit
    * cache can never serve a model from a different write. */
  private def plantedPcaFixture(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pcafix").toString
    val d = 8
    val rows = (0L until 400L).map { i =>
      val v = Array.fill(d)(0f)
      v(1) = (3.0 * math.sin(i * 1.7)).toFloat
      v(5) = math.cos(i * 0.9).toFloat
      v(3) = (0.1 * math.sin(i * 2.3)).toFloat
      (i, v, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("emb_pca recovers planted principal axes") {
    val got = graft.similarity.Pca.embPca(spark, plantedPcaFixture(), k = 3).collect()
    assert(got(0).getAs[Int]("top_dim") === 1)
    assert(got(1).getAs[Int]("top_dim") === 5)
    assert(got(2).getAs[Int]("top_dim") === 3)
    assert(got(0).getAs[Double]("var_ratio") > 0.8)
    // Loadings concentrate: the top dim carries ~all of the component.
    assert(math.abs(got(0).getAs[Double]("top_dim_loading")) > 0.99)
  }

  test("emb_pca_project: per-vector energy audit ties back to the spectrum") {
    val spec = graft.similarity.Pca.embPca(spark, sf, k = 8).collect()
      .sortBy(_.getAs[Int]("component"))
    val proj = graft.similarity.Pca.embPcaProject(spark, sf, k = 8).collect()
    assert(proj.length === vectors.size)
    proj.foreach { r =>
      val kept = r.getAs[java.lang.Double]("energy_kept")
      if (kept != null)
        assert(kept >= 0.0 && kept <= 1.0 + 1e-9, s"energy_kept $kept")
      val dc = r.getAs[Int]("dominant_component")
      assert(dc >= 0 && dc < 8)
    }
    // Orthonormal basis ⇒ Σ projected / Σ centered = Σ top-k eig /
    // trace = the spectrum's cum_ratio at k — the exact tie between
    // the apply side and the fit side.
    val sumP = proj.map(_.getAs[Double]("projected_energy")).sum
    val sumC = proj.map(_.getAs[Double]("centered_energy")).sum
    val cum8 = spec(7).getAs[Double]("cum_ratio")
    assert(math.abs(sumP / sumC - cum8) < 1e-4,
      s"energy ratio ${sumP / sumC} vs spectrum cum_ratio $cum8")
  }

  test("emb_pca_project keeps ~all energy on a planted low-rank corpus") {
    // Rank ≈ 3 fixture, so k = 3 must capture essentially everything.
    val got = graft.similarity.Pca.embPcaProject(spark, plantedPcaFixture(), k = 3)
      .collect()
    val kept = got.flatMap(r => Option(r.getAs[java.lang.Double]("energy_kept")))
    assert(kept.forall(_ > 0.999), s"min kept: ${kept.min}")
  }

  test("PQ fails loudly when the embedding dim does not divide into m sub-blocks") {
    // A non-multiple dim would silently drop the tail dimensions from
    // encode and ADC scoring, biasing every score — the guard must
    // surface it at plan time instead.
    import spark.implicits._
    val dir = "/tmp/graft-test-pq-dim"
    (0L until 20L).map(i => (i, Array.fill(12)(i.toFloat / 20f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException](Similarity.pqTopK(spark, dir))
    assert(e.getMessage.contains("dim % m == 0"), e.getMessage)
  }

  test("similarity hist covers exactly the consecutive-id pairs") {
    import SparkTestSession._
    val rows = Similarity.similarityHist(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === n - 1,
      "every consecutive-id pair lands in exactly one band")
    rows.foreach { r =>
      val lo = r.getAs[Double]("band_lo")
      assert(r.getAs[Double]("min_cos") >= lo - 1e-9)
      assert(r.getAs[Double]("min_cos") <= r.getAs[Double]("max_cos"))
      assert(r.getAs[Double]("max_cos") <= 1.0 + 1e-9)
      assert(r.getAs[Double]("avg_cos") >= r.getAs[Double]("min_cos") - 1e-4)
      assert(r.getAs[Double]("avg_cos") <= r.getAs[Double]("max_cos") + 1e-4)
    }
  }

  test("knn_graph: ranked edges, ordered cosines, mutual flag is exact") {
    val rows = Similarity.knnGraph(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getAs[Long]("src_id"))
    bySrc.foreach { case (s, es) =>
      val ranked = es.sortBy(_.getAs[Int]("rank"))
      // Ranks are 1..|edges| contiguous, at most k=5.
      assert(ranked.map(_.getAs[Int]("rank")).toSeq === (1 to ranked.length))
      assert(ranked.length <= 5)
      // Cosine non-increasing in rank (the bounded-heap order).
      ranked.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("cos") >= b.getAs[Double]("cos") - 1e-12)
        case _ => ()
      }
      // No self-loops, no duplicate endpoints per source.
      assert(!es.exists(_.getAs[Long]("dst_id") == s))
      assert(es.map(_.getAs[Long]("dst_id")).distinct.length === es.length)
      // The telemetry column: one candidate count per source, at
      // least as large as the edges it kept (the top-k is a subset of
      // the scored same-list candidates).
      assert(es.map(_.getAs[Long]("n_candidates")).distinct.length === 1)
      assert(es.head.getAs[Long]("n_candidates") >= es.length.toLong)
    }
    // The mutual flag is exactly "the reversed edge exists in the list".
    val edgeSet = rows.map(r =>
      (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id"))).toSet
    rows.foreach { r =>
      val want = edgeSet((r.getAs[Long]("dst_id"), r.getAs[Long]("src_id")))
      assert(r.getAs[Boolean]("mutual") === want, s"mutual mismatch: $r")
    }
    // On a real corpus some neighborhoods agree and some don't — both
    // flag values must occur or the column is degenerate.
    assert(rows.exists(_.getAs[Boolean]("mutual")))
    assert(rows.exists(!_.getAs[Boolean]("mutual")))
  }

  test("knn_triangles matches a brute-force driver census of the mutual graph") {
    val rows = Similarity.knnTriangles(spark, sf).collect()
    // Brute-force reference: the mutual undirected edge set from the
    // graph itself, every triangle counted by adjacency-set
    // intersection — no orientation trick to share a bug with.
    val edges = Similarity.knnGraph(spark, sf).collect()
      .filter(r => r.getAs[Boolean]("mutual") &&
        r.getAs[Long]("src_id") < r.getAs[Long]("dst_id"))
      .map(r => (r.getAs[Long]("src_id"), r.getAs[Long]("dst_id")))
    val adj = new scala.collection.mutable.HashMap[Long, Set[Long]]()
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val triOf = scala.collection.mutable.HashMap[Long, Long]()
      .withDefaultValue(0L)
    edges.foreach { case (a, b) =>
      (adj(a) & adj(b)).foreach { c => triOf(c) += 1L } // c closes (a,b)
    }
    // Each triangle is closed once per edge = 3 increments, one per
    // member — triOf is already the per-vertex count.
    val want = adj.collect { case (v, ns) if ns.size >= 2 =>
      (v, (ns.size.toLong, triOf(v)))
    }.toMap
    assert(rows.length === want.size)
    rows.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val (deg, tri) = want(v)
      assert(r.getAs[Long]("deg") === deg, s"deg of $v")
      assert(r.getAs[Long]("tri") === tri, s"tri of $v")
      val lcc = r.getAs[Double]("lcc")
      assert(lcc >= 0.0 && lcc <= 1.0, s"lcc of $v out of range: $lcc")
      assert(math.abs(lcc - 2.0 * tri / (deg * (deg - 1.0))) < 5e-5)
    }
  }

  test("recall audit counts nest, ratios recompute, and the sample is the 1% tail") {
    val r = Similarity.ivfRecallAudit(spark, sf).collect() match {
      case Array(one) => one
      case other => fail(s"1-row report, got ${other.length}")
    }
    val nAudit = r.getAs[Long]("n_audit")
    val nScored = r.getAs[Long]("n_scored")
    val nMatch = r.getAs[Long]("n_match")
    assert(nMatch <= nScored && nScored <= nAudit,
      "a match needs candidates; a scored vector needs audit membership")
    // The audit sample is exactly the >= 990k md5-ppm tail.
    import org.apache.spark.sql.functions._
    val want = Tables.embeddings(spark, sf).filter(
      graft.sources.PersistedIndex.ppmBucket(col("vec_id"), lit("#ivf")) >= 990000L
    ).count()
    assert(nAudit === want)
    assert(nAudit > 0, "the sf0.001 corpus must populate the 1% tail")
    // Published ratios are the integer-count ratio4 of the published
    // counts — the report is self-consistent, not separately derived.
    assert(r.getAs[Double]("recall_at_1") ===
      math.round(nMatch * 10000.0 / nAudit) / 10000.0)
    assert(r.getAs[Double]("scanned_share") > 0.0 &&
      r.getAs[Double]("scanned_share") <= 1.0)
    // IVF candidates per audit vector are bounded by the probed share
    // of the corpus, so scanning must undercut brute force (< 100%,
    // and with 4/16 lists probed, well under half).
    assert(r.getAs[Double]("scanned_share") < 0.5)
  }

  test("index balance tiles the postings: 16 rows, sizes conserve, balance = share*k") {
    val rows = Similarity.ivfBalance(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("centroid")).toSeq === (0 until 16))
    import org.apache.spark.sql.functions._
    val nCorp = Tables.embeddings(spark, sf).filter(
      graft.sources.PersistedIndex.ppmBucket(col("vec_id"), lit("#ivf")) < 900000L
    ).count()
    assert(rows.map(_.getAs[Long]("sz")).sum === nCorp,
      "every corpus posting lives in exactly one list")
    rows.foreach { r =>
      val share = r.getAs[Double]("share")
      assert(share >= 0.0 && share <= 1.0)
      // balance is share scaled by k, both through the same ratio4 —
      // equal up to one ulp of the 4-decimal rounding each side.
      assert(math.abs(r.getAs[Double]("balance") - share * 16) < 0.0017)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 0.0017)
  }

  test("knnGraph plan-time prep runs once per (session, dir) — no per-call count job") {
    // VERDICT r13 #4: the per-call corpus.count() was a scan job ahead
    // of the real job. The prep (count + sample + fit) is now a
    // session memo: the second call must return the SAME object with
    // zero driver-memo builds — no recompute, hence no count job.
    val first = Similarity.knnPrep(spark, sf)
    val before = graft.functions.DriverMemo.buildCount()
    val second = Similarity.knnPrep(spark, sf)
    assert(second eq first, "knnPrep recomputed on the second call")
    assert(graft.functions.DriverMemo.buildCount() === before,
      "knnPrep's second call recorded a memo build")
  }

  test("knnPrep: nLists caps only at the corpus size — nothing caps it at 1024") {
    // VERDICT r15 #1: the old driver-sample fit capped nLists at the
    // 1024-row sample, degenerating candidate volume toward n²/1024
    // past ~1M vectors. The seeded trainer's only cap is the corpus
    // itself: a 10-vector corpus floors the adaptive 16 to 10 distinct
    // hash-seeded lists, and the RULE (smallest power of 2 with
    // k² ≥ n) is checked uncapped well past 1024.
    val tmp = java.nio.file.Files.createTempDirectory("graft-knncap").toFile
    import spark.implicits._
    (0L until 10L)
      .map(i => (i, Array.tabulate(64)(d => (i * 64 + d + 1).toFloat), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite")
      .parquet(new java.io.File(tmp, "embeddings.parquet").getAbsolutePath)
    val (nLists, cents) = Similarity.knnPrep(spark, tmp.getAbsolutePath)
    assert(nLists === 10)
    assert(cents.length === 10)
    assert(cents.map(_.toSeq).distinct.length === 10,
      "duplicate seed centroids on a small corpus")
    // The doubling rule itself scales like √n with no 1024 ceiling:
    // 10^7 vectors want 4096 lists, 10^9 want 32768 (32768² ≥ 10^9).
    def rule(n: Long): Long = Iterator.iterate(16L)(_ * 2)
      .find(k => k * k >= n || k >= (1L << 20)).get
    assert(rule(10000000L) === 4096L)
    assert(rule(1000000000L) === 32768L)
    assert(rule(1L << 41) === (1L << 20)) // the 2^20 sanity ceiling binds only past 10^12 vectors
  }

  test("ann_index_drift: planted batch drift trips refit_due; in-distribution batch does not") {
    import spark.implicits._
    // Membership is md5-derived, so plant the drift in vector CONTENT:
    // compute each id's split first, then give batch ids (>= 900k)
    // vectors from a DISJOINT axis set in the drifted corpus and from
    // the corpus's own axes in the control.
    val ids = (0L until 400L).toSeq
    val buckets = ids.toDF("vec_id")
      .select(col("vec_id"), Similarity.ivfIncBucket(col("vec_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ids.exists(buckets(_) >= 900000L), "empty planted batch")
    def vec(axis: Int, i: Long): Array[Float] = {
      val v = new Array[Float](64)
      v(axis) = 1.0f
      v((axis + 5) % 64) = ((i * 7) % 13).toFloat / 100f
      v
    }
    def write(drifted: Boolean): String = {
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft-drift-$drifted").toFile
      ids.map { i =>
        val inBatch = buckets(i) >= 900000L
        val axis = if (inBatch && drifted) 32 + (i % 4).toInt else (i % 4).toInt
        (i, vec(axis, i), 0)
      }.toDF("vec_id", "embedding", "label")
        .write.mode("overwrite")
        .parquet(new java.io.File(tmp, "embeddings.parquet").getAbsolutePath)
      tmp.getAbsolutePath
    }
    def drift(dir: String, salt: String) = {
      val idx = Similarity.buildIvfIndex(spark, dir, 900000L, salt)
      Similarity.ivfDriftOver(spark, dir, idx, 900000L).collect().head
    }
    val bad = drift(write(drifted = true), "spec_drift_bad")
    assert(bad.getAs[Long]("n_corpus") + bad.getAs[Long]("n_batch") === 400L)
    assert(bad.getAs[Double]("mean_cos_corpus") > 0.9,
      s"day-0 corpus should assign tightly: $bad")
    assert(bad.getAs[Double]("mean_cos_batch") < 0.3,
      s"drifted batch should assign poorly: $bad")
    assert(bad.getAs[Boolean]("refit_due"), s"planted drift not flagged: $bad")
    val good = drift(write(drifted = false), "spec_drift_good")
    assert(math.abs(good.getAs[Double]("cos_drift")) < 0.05,
      s"in-distribution batch read as drifted: $good")
    assert(!good.getAs[Boolean]("refit_due"))
  }

  test("ann_incremental: report covers the whole batch; index side reads bucketed") {
    val incIds = Tables.embeddings(spark, sf).select(col("vec_id"))
      .filter(Similarity.ivfIncBucket(col("vec_id")) >= 900000L)
      .collect().map(_.getLong(0)).toSet
    assert(incIds.nonEmpty, "empty vector batch at fixture scale")
    val df = SparkEntry.queries("ann_incremental")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSet === incIds)
    rows.foreach { r =>
      val nCand = r.getAs[Long]("n_candidates")
      if (nCand == 0) {
        assert(r.isNullAt(r.fieldIndex("best_match")) &&
          !r.getAs[Boolean]("is_near"))
      } else {
        assert(!r.isNullAt(r.fieldIndex("best_cos")))
        assert(r.getAs[Boolean]("is_near") ===
          (r.getAs[Double]("best_cos") >= 0.9))
      }
    }
    // The postings side must read its bucketed layout (no exchange).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Bucketed: true"),
      s"IVF postings scan not bucketed:\n${plan.take(2000)}")
  }

  test("ann_incremental: frozen-quantizer append equals direct assignment of the union") {
    // Day 0: index over ivfIncBucket < 800k; day 1: append [800k, 900k)
    // under day-0's FROZEN centroids. Because assignment is row-local,
    // the appended postings must equal the direct assignment of the
    // < 900k corpus under the same centroids, row for row — the
    // operational contract (a daily append never refits; a refit is a
    // scheduled rebuild).
    val day0 = Similarity.buildIvfIndex(spark, sf, 800000L, "parity_day0")
    Similarity.appendIvfIncrement(spark, sf, day0, 800000L, 900000L)
    val got = spark.table(day0.table)
      .select(col("vec_id"), col("centroid")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val expect = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .filter(Similarity.ivfIncBucket(col("vec_id")) < 900000L)
      .select(col("vec_id"),
        element_at(graft.functions.Centroids.nearestCentroids(
          col("embedding"), day0.cents, 1), 1).as("centroid"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got === expect)
    // And the day-2 batch searches the appended index end-to-end.
    val rep = Similarity.ivfIncrementalOver(spark, sf, day0, 900000L)
    assert(rep.count() > 0)
    // A repeated append must THROW, not silently double-insert
    // postings (which would inflate n_candidates — review r15).
    val e = intercept[IllegalStateException](
      Similarity.appendIvfIncrement(spark, sf, day0, 800000L, 900000L))
    assert(e.getMessage.contains("overlaps"))
  }
}
