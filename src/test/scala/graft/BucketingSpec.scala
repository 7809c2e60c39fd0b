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
