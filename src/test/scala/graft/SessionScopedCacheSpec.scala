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

  test("evictToCap drops largest-first and stops at the cap (ADVICE r11)") {
    // Other suites share this session and may have left memo entries;
    // start from a clean slate so the largest-first order is exactly
    // the two planted entries (evicted suites simply rebuild).
    SessionScopedCache.unpersistAll(spark)
    val cache = new SessionScopedCache("spec.cap")
    def frame(rows: Int) =
      spark.range(rows).select(col("id"), md5(col("id").cast("string")).as("pad"))
        .localCheckpoint()
    cache.getOrCompute(spark, "small")(frame(5000))
    cache.getOrCompute(spark, "big")(frame(200000))
    val info = SessionScopedCache.retainedInfo(spark)
      .filter(_._1.startsWith("spec.cap#"))
    assert(info("spec.cap#small") > 0L)
    assert(info("spec.cap#big") > info("spec.cap#small"))
    val total = SessionScopedCache.retainedBytes(spark)
    // A cap that only the big entry breaches: exactly one eviction,
    // the small entry survives — the whole point vs unpersistAll.
    val cap = total - info("spec.cap#big") + info("spec.cap#small")
    assert(SessionScopedCache.evictToCap(spark, cap) === 1)
    val after = SessionScopedCache.retainedInfo(spark)
    assert(!after.contains("spec.cap#big"))
    assert(after.contains("spec.cap#small"))
    assert(SessionScopedCache.retainedBytes(spark) <= cap)
    // A generous cap evicts nothing; an unreachable cap of 0 clears
    // every nonzero entry and terminates.
    assert(SessionScopedCache.evictToCap(spark, Long.MaxValue) === 0)
    assert(SessionScopedCache.evictToCap(spark, 0L) >= 1)
    assert(!SessionScopedCache.retainedInfo(spark).contains("spec.cap#small"))
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
