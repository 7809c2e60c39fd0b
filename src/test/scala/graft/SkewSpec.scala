package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salting is a rewrite, not a heuristic: results must be EXACTLY the
  * unsalted plan's, and the shuffle key must actually widen.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("saltedJoin returns exactly the plain join's rows under heavy skew") {
    import spark.implicits._
    // 90% of fact rows under one key.
    val fact = (1L to 20000L)
      .map(i => (if (i % 10 == 0) i % 100 else 7L, i))
      .toDF("k", "v")
    val dim = (0L to 99L).map(k => (k, s"dim-$k")).toDF("k", "name")
    val plain = fact.join(dim, "k")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
    assert(salted.count() === plain.count())
    val a = salted.select("k", "v", "name").collect().map(_.toString).sorted
    val b = plain.select("k", "v", "name").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // The join's shuffle clusters on (k, _salt), not k alone.
    val planStr = salted.queryExecution.executedPlan.toString
    assert(planStr.contains("_salt"), s"salt column missing from plan:\n$planStr")
  }

  test("saltedSum equals the direct aggregation") {
    import spark.implicits._
    val df = (1L to 50000L)
      .map(i => (if (i % 20 == 0) i % 50 else 3L, i.toDouble))
      .toDF("k", "v")
    val want = df.groupBy("k").agg(sum(col("v")).as("sum"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = Skew.saltedSum(df, "k", col("v"), salts = 16)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= math.ulp(want(k)) * 64, s"key $k")
    }
  }
}
