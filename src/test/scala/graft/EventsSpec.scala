package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Events

/** Structural properties of the event-analytics rollups (the value
  * exactness is the DuckDB oracle's job; these pin the invariants a
  * correct funnel/retention must satisfy on ANY input).
  */
class EventsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("funnel stages are monotonically non-increasing with full conversion at stage 1") {
    val rows = Events.funnel(spark, sf).collect().sortBy(_.getAs[Int]("step"))
    assert(rows.map(_.getAs[Int]("step")).toSeq === Seq(1, 2, 3))
    val users = rows.map(_.getAs[Long]("n_users"))
    assert(users(0) >= users(1) && users(1) >= users(2),
      s"a strict-order funnel can never gain users downstream: ${users.toSeq}")
    assert(users(0) > 0, "corpus has view events, stage 1 must be populated")
    assert(rows(0).getAs[Double]("conversion") === 1.0)
    val conv = rows.map(_.getAs[Double]("conversion"))
    assert(conv.forall(c => c >= 0.0 && c <= 1.0))
  }

  test("retention offset 0 is exactly 1.0 and every cell is a valid fraction") {
    val rows = Events.retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val off = r.getAs[Int]("week_offset")
      val pct = r.getAs[Double]("retention_pct")
      assert(off >= 0, s"offset before the cohort week: $off")
      assert(pct > 0.0 && pct <= 1.0, s"retention out of range: $pct")
      if (off == 0)
        assert(pct === 1.0,
          "every user is active in their own first week by construction")
    }
    // Each cohort's offset-0 cell exists (the cohort definition).
    val byCohort = rows.groupBy(_.get(0))
    byCohort.values.foreach { rs =>
      assert(rs.exists(_.getAs[Int]("week_offset") == 0))
    }
  }
}
