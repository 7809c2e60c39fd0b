package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Bucketed layout ⇒ zero-shuffle joins: the ingest-once/join-free
  * economics the engine relies on for keyed workloads at scale.
  */
class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("same-bucketed tables join without an exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "key")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "key")
    Bucketing.writeBucketed(li, "b_lineitem", "key", 8)
    Bucketing.writeBucketed(ord, "b_orders", "key", 8)
    try {
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = Bucketing.bucketedJoin(spark, "b_lineitem", "b_orders", "key")
        val expected = li.join(ord, "key").count()
        assert(joined.count() === expected)
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("LWW compaction over a key-bucketed cell store is zero-shuffle") {
    // Bucketing by key satisfies the window's (key, col) clustering
    // requirement (hash on a subset of the partition spec), so the
    // reference's core read path — multi-generation LWW merge — runs
    // with NO exchange on a bucketed layout: the shuffle was paid once
    // at ingest, like the reference pays sorting at SSTable flush.
    val cells = graft.kv.Kv.cells(spark, sf)
    Bucketing.writeBucketed(cells, "b_cells", "key", 8)
    try {
      val compacted = graft.kv.Kv.lww(spark.table("b_cells"))
      compacted.count()
      val plan = compacted.queryExecution.executedPlan.toString
      assert(plan.contains("Aggregate"), "expected aggregation-based compaction")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed LWW should not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_cells")
  }

  test("bucketed aggregation on the bucket key needs no exchange") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "key")
    Bucketing.writeBucketed(li, "b_li_agg", "key", 8)
    try {
      val agg = spark.table("b_li_agg").groupBy("key")
        .agg(sum("l_quantity").as("q"))
      agg.count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed groupBy should not shuffle:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS b_li_agg")
  }
}
