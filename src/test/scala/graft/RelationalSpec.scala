package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.warehouse.dir", "/tmp/graft-test-warehouse")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val n = SparkEntry.queries(name)(spark, sf).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql without queries: $orphans")
  }

  test("q1 aggregates are decimal-exact (partitioning-stable)") {
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    // Presentation is double (the oracle compare's canonical numeric
    // form), but the SUM underneath must still run over decimals so the
    // result is bit-stable under any partitioning.
    val moneyTypes = Seq("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge")
      .map(c => df.schema(c).dataType.typeName)
    assert(moneyTypes.forall(_ == "double"), s"non-double presentation columns: $moneyTypes")
    val analyzed = df.queryExecution.analyzed.toString
    assert(analyzed.contains("decimal(30,"),
      s"expected decimal-typed internal sums in plan:\n$analyzed")
    // Re-run with different partitioning: results must be bitwise identical.
    val a = df.collect().map(_.toString).sorted
    val b = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .repartition(7).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("approx_count_distinct stays within HLL error bounds of exact") {
    val approx = SparkEntry.queries("approx_distinct")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = graft.sources.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct("l_partkey").as("p"),
        org.apache.spark.sql.functions.countDistinct("l_orderkey").as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, o)) =>
      val (ap, ao) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$k parts: $ap vs $p")
      assert(math.abs(ao - o).toDouble / o < 0.1, s"$k orders: $ao vs $o")
    }
  }

  test("q6 filters are pushed to the parquet scan") {
    val df = SparkEntry.queries("q6_forecast_revenue")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"),
      s"expected shipdate pushdown in plan:\n$plan")
  }

  test("q5 broadcasts its dimension tables") {
    val df = SparkEntry.queries("q5_local_supplier")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast joins in plan:\n$plan")
  }
}
