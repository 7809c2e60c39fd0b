package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOf
import graft.sources.Tables

/** The custom as-of join (logical node + strategy + merge exec) against
  * an independent union-window formulation, plus plan-shape checks.
  */
class AsOfSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Window-based oracle: tag both sides, union, per-user running last
    * click, filter to purchases. Only expressible WITHOUT tolerance
    * restrictions via this route at the filter step afterwards. */
  private def windowOracle(tolUs: Long): Map[Long, Option[Long]] = {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), lit(null).cast("long").as("cid"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), lit(-1L).as("event_id"), col("ts"), col("event_id").as("cid"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("cid").desc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, 0)
    p.unionAll(c)
      .withColumn("last_click", last(col("cid"), ignoreNulls = true).over(w))
      .withColumn("last_click_ts", last(when(col("cid").isNotNull, col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_id") >= 0)
      .withColumn("match",
        when(col("last_click").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_click_ts")) <= tolUs,
          col("last_click")))
      .collect().map(r => r.getLong(1) -> Option(r.get(r.fieldIndex("match")))
        .map(_.asInstanceOf[Long])).toMap
  }

  test("as-of join matches the union-window oracle on real events") {
    val tolUs = 7L * 24 * 3600 * 1000000L
    val got = AsOf.eventsAsofJoin(spark, sf).collect()
      .map(r => r.getLong(1) -> Option(r.get(r.fieldIndex("click_id")))
        .map(_.asInstanceOf[Long])).toMap
    val want = windowOracle(tolUs)
    assert(got.keySet === want.keySet)
    got.foreach { case (pid, cid) =>
      assert(cid === want(pid), s"purchase $pid matched $cid, want ${want(pid)}")
    }
  }

  test("the custom exec is planned with co-partitioned merge, no cartesian") {
    val df = AsOf.eventsAsofJoin(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing from plan:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // Catalyst inserted the declared exchanges + sorts for us.
    assert(plan.contains("Exchange hashpartitioning") && plan.contains("Sort "),
      "expected planner-inserted shuffle and sort")
  }

  test("tolerance bounds the match window") {
    val ev = Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("cid"), col("ts").as("cts"))
    val tight = AsOf.asofJoin(p, c, Seq(p("user_id")), Seq(c("cu")),
        p("ts"), c("cts"), toleranceUs = 1000L)
      .filter(col("cid").isNotNull).count()
    val loose = AsOf.asofJoin(p, c, Seq(p("user_id")), Seq(c("cu")),
        p("ts"), c("cts"), toleranceUs = -1L)
      .filter(col("cid").isNotNull).count()
    assert(tight <= loose)
    assert(loose > 0, "some purchase should have a prior click")
  }
}
