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
}
