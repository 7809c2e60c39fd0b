package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(SparkSession, key) memoized DataFrames for subtrees shared
  * across queries (the exact dedup pair set, the token-count table).
  *
  * A weak-KEYED map alone cannot free these entries: a Dataset
  * strongly references its SparkSession, so the cached values
  * resurrect their own key — exactly the value→key caveat in the
  * WeakHashMap javadoc. Entries are therefore also evicted
  * explicitly when the session's SparkContext ends (application-end
  * listener registered once per session), which breaks the cycle in
  * JVMs that cycle sessions — test suites, notebook servers — while
  * the weak keying still covers sessions dropped without a stop().
  * The builder runs OUTSIDE the outer map lock (it may launch Spark
  * jobs); the inner ConcurrentHashMap's computeIfAbsent runs it once
  * per key — the same contract the per-module caches had.
  */
private[graft] final class SessionScopedCache {

  private val cache =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()

  def getOrCompute(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = new ConcurrentHashMap[String, DataFrame]()
        cache.put(spark, m)
        spark.sparkContext.addSparkListener(new SparkListener {
          override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
            cache.synchronized { cache.remove(spark) }
        })
      }
      m
    }
    perSession.computeIfAbsent(key, _ => build)
  }
}
