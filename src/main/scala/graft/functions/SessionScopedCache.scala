package graft.functions

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.LogicalRDD

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
  *
  * FOOTPRINT (the r8/r9 accounting gap): the cached values are
  * `localCheckpoint()`ed frames whose blocks sit in executor storage
  * until the session ends — ~10 artifacts in a full bench session,
  * previously with no way to see or reclaim them. Every instance now
  * registers in a process-wide registry, and the companion exposes
  * [[SessionScopedCache.retainedInfo]] (per-entry block bytes from
  * the SparkContext's RDD storage listing) plus
  * [[SessionScopedCache.unpersist]] /
  * [[SessionScopedCache.unpersistAll]] to drop entries and free their
  * blocks between pipeline stages. Reclamation is EXPLICIT by design:
  * a localCheckpoint truncates lineage, so an automatic evictor that
  * unpersisted a block while a caller still held the frame would
  * leave it unrecomputable — the safe contract is
  * account-always/free-on-request, with the entry removed from the
  * map in the same call so the next consumer rebuilds instead of
  * reading a gutted checkpoint.
  */
private[graft] final class SessionScopedCache(val name: String = "cache") {
  SessionScopedCache.register(this)

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
    perSession.computeIfAbsent(key, { _ =>
      DriverMemo.recordBuild()
      build
    })
  }

  /** This instance's live entries for `spark`, as `name#key` → frame. */
  private[graft] def entries(spark: SparkSession): Map[String, DataFrame] =
    cache.synchronized { Option(cache.get(spark)) }
      .map(_.asScala.map { case (k, v) => s"$name#$k" -> v }.toMap)
      .getOrElse(Map.empty)

  /** Drop `key` (bare, without the instance prefix) and unpersist its
    * checkpoint blocks. Returns true when an entry was removed. */
  private[graft] def drop(spark: SparkSession, key: String): Boolean = {
    val removed = cache.synchronized { Option(cache.get(spark)) }
      .flatMap(m => Option(m.remove(key)))
    removed.foreach(SessionScopedCache.unpersistBlocks)
    removed.isDefined
  }
}

private[graft] object SessionScopedCache {

  // Instances are static module singletons; a strong list is their
  // natural lifetime.
  private val instances =
    new java.util.concurrent.CopyOnWriteArrayList[SessionScopedCache]()

  private def register(c: SessionScopedCache): Unit = instances.add(c)

  /** The checkpoint RDD ids a memoized frame pins in block storage:
    * every LogicalRDD leaf of its analyzed plan (a localCheckpoint'd
    * frame is exactly one). */
  private def rddIdsOf(df: DataFrame): Seq[Int] =
    df.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd.id }

  private def unpersistBlocks(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = true)
      case _ => ()
    }

  /** Per-entry retained block bytes (memory + disk) for `spark`,
    * across every module cache, keyed `instance#key`. The bytes come
    * from the SparkContext's own storage listing, so the number is
    * the session's real footprint, not an estimate. */
  def retainedInfo(spark: SparkSession): Map[String, Long] = {
    val storage = spark.sparkContext.getRDDStorageInfo
      .map(i => i.id -> (i.memSize + i.diskSize)).toMap
    instances.asScala.flatMap(_.entries(spark)).map { case (k, df) =>
      k -> rddIdsOf(df).map(storage.getOrElse(_, 0L)).sum
    }.toMap
  }

  /** Total retained checkpoint bytes for `spark` across all caches. */
  def retainedBytes(spark: SparkSession): Long =
    retainedInfo(spark).values.sum

  /** Live memo entry count for `spark` across all caches — the signal
    * a bench attempt uses to attribute a first-materialization spike:
    * bytes can be tiny for a small pair list whose PIPELINE was
    * expensive, but the entry-count delta is 1 the attempt that built
    * it and 0 every attempt after. */
  def retainedEntries(spark: SparkSession): Int =
    instances.asScala.map(_.entries(spark).size).sum

  /** Drop one entry by its `instance#key` name (as printed by
    * [[retainedInfo]]), unpersisting its blocks. */
  def unpersist(spark: SparkSession, qualifiedKey: String): Boolean =
    qualifiedKey.split("#", 2) match {
      case Array(inst, key) =>
        instances.asScala.filter(_.name == inst).exists(_.drop(spark, key))
      case _ => false
    }

  /** Evict LARGEST-first until the session's retained checkpoint
    * bytes fit under `cap`; returns how many entries were dropped.
    * The cap-breach policy (ADVICE r11): dropping the WHOLE memo on a
    * breach forces every later sharer — the remaining bench queries,
    * or Verify's remaining dumps — to rebuild pipelines the cap never
    * required them to lose; shrinking below the cap evicts only what
    * the accounting says is oversized, and [[retainedInfo]]'s
    * per-entry bytes make largest-first the minimal-eviction order.
    * Entries whose accounted bytes are zero (blocks already gone, or
    * a frame checkpointed to nothing) cannot reduce the footprint and
    * are left alone — if the remaining nonzero entries cannot reach
    * the cap the method evicts them all and returns; it never spins. */
  def evictToCap(spark: SparkSession, cap: Long): Int = {
    val info = retainedInfo(spark).toSeq.filter(_._2 > 0).sortBy(-_._2)
    var retained = retainedBytes(spark)
    var dropped = 0
    val it = info.iterator
    while (retained > cap && it.hasNext) {
      val (key, bytes) = it.next()
      if (unpersist(spark, key)) { dropped += 1; retained -= bytes }
    }
    dropped
  }

  /** Drop every memoized entry for `spark`; returns how many. */
  def unpersistAll(spark: SparkSession): Int =
    instances.asScala.map { c =>
      val ks = c.entries(spark).keys.map(_.split("#", 2)(1)).toSeq
      ks.count(c.drop(spark, _))
    }.sum
}
