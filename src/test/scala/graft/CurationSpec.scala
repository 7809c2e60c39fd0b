package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

/** Structural invariants of the end-to-end curation funnel (the exact
  * numbers are the composed DuckDB oracle's job at the driver gate).
  */
class CurationSpec extends AnyFunSuite {
  import SparkTestSession._

  test("curation funnel is monotone and consistent with its stage operators") {
    val rows = Curation.report(spark, sf).collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq === (0 to 5))
    assert(rows.map(_.getString(1)).toSeq ===
      Seq("raw", "quality", "language", "dedup", "decontaminate", "sample"))
    val docs = rows.map(_.getAs[Long]("n_docs"))
    val toks = rows.map(_.getAs[Long]("n_tokens"))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      s"a funnel can never gain docs downstream: ${docs.toSeq}")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      s"a funnel can never gain tokens downstream: ${toks.toSeq}")
    assert(rows(0).getAs[Double]("pct_of_raw") === 1.0)
    assert(docs(0) === graft.sources.Tables.documents(spark, sf).count())
    assert(docs(1) > 0, "the quality gate should keep part of the corpus")
    // The dedup stage can keep at most what the survivor pick keeps.
    assert(docs(3) <= graft.dedup.Dedup.survivors(spark, sf).count())
    rows.foreach { r =>
      val pct = r.getAs[Double]("pct_of_raw")
      assert(pct >= 0.0 && pct <= 1.0, s"pct out of range: $pct")
    }
  }

  test("dedup_quality_audit partitions the corpus and agrees with its stage operators (r13)") {
    val rows = Curation.dedupQualityAudit(spark, sf).collect()
      .map(r => r.getAs[String]("verdict") -> r).toMap
    // The three verdict classes tile the corpus exactly.
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum ===
      graft.sources.Tables.documents(spark, sf).count())
    // Winners + uniques = the survivor pick; dropped = the rest.
    val survivors = graft.dedup.Dedup.survivors(spark, sf).count()
    val kept = rows.get("winner").map(_.getAs[Long]("n_docs")).getOrElse(0L) +
      rows.get("unique").map(_.getAs[Long]("n_docs")).getOrElse(0L)
    assert(kept === survivors, s"verdicts disagree with dedup_survivors: $kept vs $survivors")
    // Winners and dropped both exist on this corpus (it has real
    // near-dup clusters), and every cluster has exactly one winner,
    // so winner count = cluster count.
    val cl = graft.dedup.Dedup.clusters(spark, sf)
    assert(rows("winner").getAs[Long]("n_docs") ===
      cl.select("cluster_id").distinct().count())
    assert(rows("dropped").getAs[Long]("n_docs") ===
      cl.count() - cl.select("cluster_id").distinct().count())
    rows.values.foreach { r =>
      val mean = r.getAs[Double]("mean_q4")
      val low = r.getAs[Double]("low_frac")
      assert(mean >= 0.0 && mean <= 10000.0, s"mean_q4 out of range: $r")
      assert(low >= 0.0 && low <= 1.0, s"low_frac out of range: $r")
    }
  }

  test("split_leakage: dense 6-cell matrix tiles the exact pair set") {
    val rows = Curation.splitLeakage(spark, sf).collect()
    assert(rows.length === 6, "one cell per unordered split pair")
    // Cells tile the pair set: counts sum to the near-dup pair count.
    val nPairs = graft.dedup.Dedup.ngramJaccard(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nPairs)
    // is_leak is exactly the off-diagonal.
    rows.foreach { r =>
      assert(r.getAs[Boolean]("is_leak") ===
        (r.getAs[String]("split_a") != r.getAs[String]("split_b")))
      assert(r.getAs[String]("split_a") <= r.getAs[String]("split_b"),
        s"cell not normalized: $r")
    }
    // Recount one cell independently from the shared building blocks.
    import org.apache.spark.sql.functions._
    val asn = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.text.Text.splitAssign(col("doc_id")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = graft.dedup.Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (asn(r.getLong(0)), asn(r.getLong(1))))
      .map { case (a, b) => if (a <= b) (a, b) else (b, a) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("split_a"), r.getAs[String]("split_b"))
      assert(r.getAs[Long]("n_pairs") === want.getOrElse(k, 0L), s"cell $k")
    }
  }

  test("corpus_diff: statuses tile both snapshots and the revision marker is the only delta") {
    import graft.pipeline.Curation
    import graft.sources.{PersistedIndex, Tables}
    import org.apache.spark.sql.functions._
    val rows = Curation.corpusDiffDemo(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val b = PersistedIndex.ppmBucket(col("doc_id"), lit("#ver"))
    val nV1 = docs.filter(b < 900000L).count()
    val nV2 = docs.filter(b >= 50000L).count()
    def tot(statuses: Set[String]) =
      rows.filter(r => statuses(r.getAs[String]("status")))
        .map(_.getAs[Long]("n_docs")).sum
    // Every v1 doc is removed/changed/unchanged; every v2 doc is
    // added/changed/unchanged — the diff tiles both snapshots.
    assert(tot(Set("removed", "changed", "unchanged")) === nV1)
    assert(tot(Set("added", "changed", "unchanged")) === nV2)
    assert(tot(Set("changed")) > 0, "the b%7 revision slice is non-empty")
    rows.foreach { r =>
      (r.getAs[String]("status"), r.getAs[Long]("delta_chars")) match {
        case ("unchanged", d) => assert(d === 0L)
        case ("removed", d) =>
          assert(r.getAs[Long]("chars_v2") === 0L && d < 0L)
        case ("added", d) =>
          assert(r.getAs[Long]("chars_v1") === 0L && d > 0L)
        case ("changed", d) =>
          // In-place revisions append exactly the 7-char marker.
          assert(d === 7L * r.getAs[Long]("n_docs"))
        case (s, _) => fail(s"unknown status $s")
      }
    }
  }
}
