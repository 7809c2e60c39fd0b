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

  test("both as-of children land co-partitioned on the join keys") {
    import org.apache.spark.sql.catalyst.plans.physical.ClusteredDistribution
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.graftbridge.AsOfJoinExec
    // AQE hides subtrees behind leaf QueryStageExec nodes; recurse through.
    def findAsOf(p: SparkPlan): Seq[AsOfJoinExec] = p match {
      case a: AdaptiveSparkPlanExec => findAsOf(a.executedPlan)
      case q: QueryStageExec => findAsOf(q.plan)
      case e: AsOfJoinExec => e +: e.children.flatMap(findAsOf)
      case other => other.children.flatMap(findAsOf)
    }
    val df = AsOf.eventsAsofJoin(spark, sf)
    df.collect()
    val asof = findAsOf(df.queryExecution.executedPlan)
    assert(asof.nonEmpty,
      s"AsOfJoinExec missing from plan:\n${df.queryExecution.executedPlan}")
    asof.foreach { e =>
      // The ClusteredDistribution contract: each child's runtime
      // partitioning (post-AQE coalescing included) must cluster on the
      // declared keys, and both sides must agree on partition count —
      // otherwise zipPartitions pairs rows of different keys.
      val Seq(lp, rp) = e.children.map(_.outputPartitioning)
      assert(lp.satisfies(ClusteredDistribution(e.leftKeys)),
        s"left as-of child not clustered on ${e.leftKeys}: $lp")
      assert(rp.satisfies(ClusteredDistribution(e.rightKeys)),
        s"right as-of child not clustered on ${e.rightKeys}: $rp")
      assert(lp.numPartitions == rp.numPartitions,
        s"as-of children partition counts differ: $lp vs $rp")
    }
  }

  test("skewed key distribution still matches a window oracle") {
    import spark.implicits._
    // 90% of right rows under one hot key; interleaved times.
    val left = (1L to 200L).map(i => (if (i % 10 == 0) i else 1L, i * 100L, i))
      .toDF("k", "t", "id")
    val right = (1L to 2000L).map(i => (if (i % 10 == 0) i / 10 else 1L, i * 7L, i))
      .toDF("rk", "rt", "rid")
    val got = AsOf.asofJoin(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
        toleranceUs = -1L, rightSeq = Seq(right("rid")))
      .select(col("id"), col("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    // Oracle: brute force in memory.
    val rightRows = (1L to 2000L).map(i => (if (i % 10 == 0) i / 10 else 1L, i * 7L, i))
    val want = (1L to 200L).map { i =>
      val (k, t) = (if (i % 10 == 0) i else 1L, i * 100L)
      val cands = rightRows.filter(r => r._1 == k && r._2 <= t)
      i -> (if (cands.isEmpty) None
            else Some(cands.maxBy(r => (r._2, r._3))._3))
    }.toMap
    assert(got === want)
  }

  test("NULL times and keys never match; non-null rows are unaffected") {
    import spark.implicits._
    // left: (key, time, id); right: (key, time, id)
    val left = Seq(
      (Some(1L), Some(100L), 10L),   // normal: matches right id 1
      (Some(1L), None, 11L),         // NULL time -> unmatched
      (None, Some(100L), 12L),       // NULL key -> unmatched
      (Some(2L), Some(50L), 13L)     // key whose only right rows are null-time/key
    ).toDF("k", "t", "id")
    val right = Seq(
      (Some(1L), Some(90L), 1L),     // the match for left id 10
      (Some(1L), None, 2L),          // NULL time -> skipped (else would be a candidate)
      (None, Some(40L), 3L),         // NULL key -> skipped
      (Some(2L), None, 4L)           // NULL time under key 2 -> skipped
    ).toDF("rk", "rt", "rid")
    val out = AsOf.asofJoin(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
        toleranceUs = -1L, rightSeq = Seq(right("rid")))
      .select(col("id"), col("rid"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(10L -> Some(1L), 11L -> None, 12L -> None, 13L -> None))
  }

  test("equal (key, time) right rows break ties to the largest seq") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 95L, 11L)).toDF("k", "t", "id")
    // Three right rows at the identical (key, time): winner must be rid 9.
    val right = Seq((1L, 95L, 7L), (1L, 95L, 9L), (1L, 95L, 8L), (1L, 90L, 1L))
      .toDF("rk", "rt", "rid")
    (1 to 5).foreach { i =>
      val out = AsOf.asofJoin(left.repartition(i), right.repartition(6 - i),
          Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
          toleranceUs = -1L, rightSeq = Seq(right("rid")))
        .select(col("id"), col("rid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(10L -> 9L, 11L -> 9L), s"partitioning $i picked wrong tie winner")
    }
  }

  test("forward as-of matches a brute-force oracle on real events") {
    val tolUs = 7L * 24 * 3600 * 1000000L
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).toInstant.getEpochSecond * 1000000L +
          r.getTimestamp(2).toInstant.getNano / 1000L, r.getString(3)))
    val clicks = ev.filter(_._4 == "click")
    val want = ev.filter(_._4 == "purchase").map { p =>
      val cands = clicks.filter(c =>
        c._1 == p._1 && c._3 >= p._3 && c._3 - p._3 <= tolUs)
      // earliest click, ties to the SMALLEST click_id (forward rule)
      p._2 -> (if (cands.isEmpty) None
               else Some(cands.minBy(c => (c._3, c._2))._2))
    }.toMap
    val got = AsOf.eventsAsofNext(spark, sf).collect()
      .map(r => r.getLong(1) -> Option(r.get(r.fieldIndex("click_id")))
        .map(_.asInstanceOf[Long])).toMap
    assert(got === want)
  }

  test("forward includes an exact-equal time and ties to the smallest seq") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 11L)).toDF("k", "t", "id")
    // Two right rows exactly AT t=100 (winner must be the smaller rid 3),
    // one later (the only forward candidate for t=101), one earlier
    // (backward-only, must never match forward).
    val right = Seq((1L, 100L, 5L), (1L, 100L, 3L), (1L, 150L, 7L), (1L, 90L, 1L))
      .toDF("rk", "rt", "rid")
    (1 to 4).foreach { i =>
      val out = AsOf.asofJoin(left.repartition(i), right.repartition(5 - i),
          Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
          toleranceUs = -1L, rightSeq = Seq(right("rid")),
          direction = "forward")
        .select(col("id"), col("rid"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(out === Map(10L -> 3L, 11L -> 7L),
        s"partitioning $i picked the wrong forward winner")
    }
  }

  test("nearest picks the closer side and keeps backward on exact ties") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L),  // back at 95 (d=5), fwd at 102 (d=2) -> fwd 4
      (1L, 96L, 11L),   // back at 95 (d=1), fwd at 102 (d=6) -> back 2
      (1L, 99L, 12L),   // back at 95 (d=4), fwd at 102 (d=3) -> fwd 4
      (2L, 50L, 13L),   // back at 45 (d=5), fwd at 55 (d=5): tie -> back 5
      (3L, 10L, 14L),   // forward-only key
      (4L, 10L, 15L)    // backward-only key
    ).toDF("k", "t", "id")
    val right = Seq(
      (1L, 95L, 2L), (1L, 102L, 4L),
      (2L, 45L, 5L), (2L, 55L, 6L),
      (3L, 20L, 7L), (4L, 5L, 8L)
    ).toDF("rk", "rt", "rid")
    val out = AsOf.asofJoin(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
        toleranceUs = -1L, rightSeq = Seq(right("rid")),
        direction = "nearest")
      .select(col("id"), col("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(10L -> 4L, 11L -> 2L, 12L -> 4L,
      13L -> 5L, 14L -> 7L, 15L -> 8L))
  }

  test("nearest respects tolerance on each side independently") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "t", "id")
    // back at 80 (d=20), fwd at 109 (d=9); tolerance 10 excludes back.
    val right = Seq((1L, 80L, 1L), (1L, 109L, 2L)).toDF("rk", "rt", "rid")
    val out = AsOf.asofJoin(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
        toleranceUs = 10L, rightSeq = Seq(right("rid")),
        direction = "nearest")
      .select(col("id"), col("rid")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out === Map(10L -> Some(2L)))
    // tolerance 5 excludes both.
    val none = AsOf.asofJoin(left, right,
        Seq(left("k")), Seq(right("rk")), left("t"), right("rt"),
        toleranceUs = 5L, rightSeq = Seq(right("rid")),
        direction = "nearest")
      .select(col("id"), col("rid")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(none === Map(10L -> None))
  }

  test("an unknown direction fails loudly at plan construction") {
    import spark.implicits._
    val df = Seq((1L, 1L, 1L)).toDF("k", "t", "id")
    val e = intercept[IllegalArgumentException] {
      AsOf.asofJoin(df, df.select(col("k").as("rk"), col("t").as("rt"), col("id").as("rid")),
        Seq(df("k")), Nil, df("t"), df("t"), -1L, Nil, direction = "sideways")
    }
    assert(e.getMessage.contains("sideways"))
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
