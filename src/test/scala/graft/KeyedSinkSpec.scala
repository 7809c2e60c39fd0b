package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.KeyedSink
import graft.sinks.KeyedSink.{TtlPolicy, WriteStats}

/** The create-only keyed sink contract (reference: AerospikeWriter's
  * AS_POLICY_EXISTS_CREATE + TTL flags + end-of-run stats).
  */
class KeyedSinkSpec extends AnyFunSuite {
  import SparkTestSession._

  private def freshDir(): String =
    Files.createTempDirectory("keyed_sink").resolve("target").toString

  private def mkDf(rows: (String, Long, java.lang.Long, Long)*) = {
    val sparkS = spark
    import sparkS.implicits._
    rows.toSeq.toDF("key", "value", "expiry_us", "ttl_us")
  }

  test("first write creates, second write skips existing keys") {
    val target = freshDir()
    val s1 = KeyedSink.createOnlyAppend(spark, mkDf(
      ("a", 1L, null, 0L), ("b", 2L, null, 0L)), target)
    assert(s1 === WriteStats(2, 2, 0, 0))

    val s2 = KeyedSink.createOnlyAppend(spark, mkDf(
      ("b", 99L, null, 0L), ("c", 3L, null, 0L)), target)
    assert(s2 === WriteStats(2, 1, 1, 0))

    // b kept its ORIGINAL value (create-only, never update).
    val b = spark.read.parquet(target).filter(col("key") === "b")
      .select("value").collect().map(_.getLong(0)).toSeq
    assert(b === Seq(2L))
    assert(spark.read.parquet(target).count() === 3)
  }

  test("TTL policy: expired and below-min-TTL rows are dropped and counted") {
    val target = freshDir()
    val now = 1000000L
    val policy = TtlPolicy(minTtlUs = 50L, nowUs = now)
    val s = KeyedSink.createOnlyAppend(spark, mkDf(
      ("a", 1L, now + 100L, 100L),   // live
      ("b", 2L, now - 1L, 100L),     // expired
      ("c", 3L, now + 100L, 10L),    // ttl below minimum
      ("d", 4L, null, 0L)),          // eternal, allowed
      target, Some(policy))
    assert(s === WriteStats(4, 2, 0, 2))
    val keys = spark.read.parquet(target).select("key")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(keys === Seq("a", "d"))
  }

  test("prohibit-eternal drops null-expiry rows") {
    val target = freshDir()
    val policy = TtlPolicy(prohibitEternal = true, nowUs = 0L)
    val s = KeyedSink.createOnlyAppend(spark, mkDf(
      ("a", 1L, 100L, 100L), ("b", 2L, null, 0L)), target, Some(policy))
    assert(s === WriteStats(2, 1, 0, 1))
  }

  test("record TTL from first expiring cell kills the whole key group") {
    val target = freshDir()
    val now = 1000L
    val policy = TtlPolicy(recordTtlFromFirst = true, nowUs = now)
    val s = KeyedSink.createOnlyAppend(spark, mkDf(
      ("a", 1L, now + 10L, 10L), ("a", 2L, now - 1L, 10L), // one dead cell kills 'a'
      ("b", 3L, now + 10L, 10L), ("b", 4L, now + 20L, 10L)), // all live
      target, Some(policy))
    assert(s.written === 2 && s.expired === 2)
    val keys = spark.read.parquet(target).select("key")
      .collect().map(_.getString(0)).distinct.toSeq
    assert(keys === Seq("b"))
  }

  test("rerunning the same export is idempotent") {
    val target = freshDir()
    val df = mkDf(("a", 1L, null, 0L), ("b", 2L, null, 0L))
    KeyedSink.createOnlyAppend(spark, df, target)
    val s2 = KeyedSink.createOnlyAppend(spark, df, target)
    assert(s2 === WriteStats(2, 0, 2, 0))
    assert(spark.read.parquet(target).count() === 2)
  }
}
