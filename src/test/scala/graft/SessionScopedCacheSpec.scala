package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SessionScopedCache

/** The session-memo footprint accounting and reclamation API (the
  * r8/r9 "bound and account" task): retained checkpoint bytes are
  * visible per entry from the SparkContext's own storage listing, and
  * an explicit unpersist drops the entry AND frees its blocks. */
class SessionScopedCacheSpec extends AnyFunSuite {
  import SparkTestSession._

  test("memoized checkpoints are accounted per entry and freed on unpersist") {
    val cache = new SessionScopedCache("spec.cache")
    var builds = 0
    def build(): org.apache.spark.sql.DataFrame = {
      builds += 1
      spark.range(50000).select(col("id"), md5(col("id").cast("string")).as("pad"))
        .localCheckpoint()
    }
    val df = cache.getOrCompute(spark, "k1")(build())
    cache.getOrCompute(spark, "k1")(build())
    assert(builds === 1, "memoization must build once per (session, key)")
    assert(df.count() === 50000)

    // Accounting: the entry shows up under its qualified name with the
    // real block bytes the checkpoint pins.
    val info = SessionScopedCache.retainedInfo(spark)
    assert(info.contains("spec.cache#k1"), s"entry missing from $info")
    assert(info("spec.cache#k1") > 0L,
      s"checkpoint blocks must be visible as retained bytes: $info")
    assert(SessionScopedCache.retainedBytes(spark) >= info("spec.cache#k1"))

    // Reclamation: unpersist drops the entry and frees the blocks.
    assert(SessionScopedCache.unpersist(spark, "spec.cache#k1"))
    assert(!SessionScopedCache.retainedInfo(spark).contains("spec.cache#k1"))
    assert(!SessionScopedCache.unpersist(spark, "spec.cache#k1"),
      "double-unpersist must report no entry")

    // The next consumer REBUILDS (fresh checkpoint) instead of reading
    // a gutted one — the safety contract that rules out auto-eviction.
    val df2 = cache.getOrCompute(spark, "k1")(build())
    assert(builds === 2)
    assert(df2.count() === 50000)
    SessionScopedCache.unpersist(spark, "spec.cache#k1")
  }

  test("keys with '#' in the cached key round-trip through the qualified name") {
    val cache = new SessionScopedCache("spec.hashkey")
    cache.getOrCompute(spark, "/some/dir#phash_pairs")(
      spark.range(10).toDF().localCheckpoint())
    val qualified = "spec.hashkey#/some/dir#phash_pairs"
    assert(SessionScopedCache.retainedInfo(spark).contains(qualified))
    assert(SessionScopedCache.unpersist(spark, qualified))
    assert(!SessionScopedCache.retainedInfo(spark).contains(qualified))
  }
}
