package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{concat, conv, md5, substring}

/** Shared machinery for SESSION-BUILT persisted bucketed indexes —
  * the dedup signature index pair (graft.dedup.Dedup) and the ANN IVF
  * postings table (graft.similarity.Similarity) both follow the same
  * lifecycle, and before r15's review each carried its own copy of
  * all four pieces (review r15: four near-copies kept in sync by
  * hand):
  *
  *   1. a collision-proof table-name key,
  *   2. warehouse drop-and-recreate hygiene,
  *   3. a per-(session, key) memo for the built handle, and
  *   4. the append high-water manifest below.
  */
object PersistedIndex {

  /** The md5-ppm bucket of a key column — ONE definition of the
    * house deterministic-split convention (review r15 stretch: the
    * same five lines lived in Dedup.incBucket, Similarity.ivfIncBucket
    * and the Text/Multimodal/Curation sampling variants, hand-synced):
    * uniform-pseudorandom in [0, 1 000 000), KEY-derived — stable
    * under re-runs, repartitioning and data relocation — and
    * replayable in DuckDB as
    * `CAST(concat('0x', substring(md5(key || salt), 1, 12)) AS
    * UBIGINT) % 1000000`. `salt` is a Column so both literal salts
    * (`lit("#inc")`) and per-row salts (`concat(lit("#"),
    * col("source"))` — the stratified-sampling form) share it. */
  def ppmBucket(key: Column, salt: Column): Column =
    conv(substring(md5(concat(key.cast("string"), salt)
      .cast("binary")), 1, 12), 16, 10).cast("long") % 1000000L

  /** Collision-proof table-name key (ADVICE r14: dir.hashCode could
    * collide across two dirs in one session, silently cross-serving
    * indexes): full MD5 hex of `dir` + NUL + `salt` — NUL can appear
    * in neither, so the pair is unambiguous (a separator that can
    * occur in a dir, like ' ', would make ("a ", "b") and
    * ("a", " b") collide). */
  def tableKey(dir: String, salt: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest((dir + "\u0000" + salt)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString

  /** Drop a managed table AND its possibly-orphaned warehouse
    * directory: a PREVIOUS JVM may have left the directory in the
    * (filesystem-persistent) warehouse while the in-memory catalog
    * starts empty — saveAsTable would then refuse with
    * LOCATION_ALREADY_EXISTS. Also clears the table's append
    * manifest, so a rebuild resets the ingest high-water. */
  def dropAndClean(spark: SparkSession, table: String): Unit = {
    Seq(table, manifestOf(table)).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), t)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** Per-(session, key) memo for built index handles. Values are
    * plain (table names, centroid arrays — no Dataset), so weak
    * keying on the session is sound: when the session is collected
    * the entry goes with it. */
  final class SessionMemo[V] {
    private val maps =
      new java.util.WeakHashMap[SparkSession, java.util.concurrent.ConcurrentHashMap[
        String, V]]()
    def getOrCompute(spark: SparkSession, key: String)(build: => V): V =
      maps.synchronized {
        var m = maps.get(spark)
        if (m == null) {
          m = new java.util.concurrent.ConcurrentHashMap[String, V]()
          maps.put(spark, m)
        }
        m
      }.computeIfAbsent(key, _ => build)
  }

  private def manifestOf(table: String): String = table + "_hw"

  /** Per-index append locks (ADVICE r15): the manifest's overlap
    * check is check-then-write, so two concurrent appenders of the
    * SAME index could each see no overlap and both append — exactly
    * the silent double-insert the manifest exists to prevent. A JVM
    * lock keyed on the manifest name serializes them; a multi-DRIVER
    * deployment needs the same single-writer contract at the catalog
    * layer, which every production ingest pipeline already runs. */
  private val appendLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Throw if [loIncl, hiExcl) overlaps an already-recorded append of
    * `table` — the loud half of exactly-once (the Kv.migrate -W
    * discipline applied to batch ingest). Why loud and not silent: a
    * repeated or overlapping append double-inserts rows, and under a
    * READ-time bucket cap a doubled bucket crosses the cap and is
    * dropped wholesale — real duplicates would then be reported as
    * clean (review r15). */
  private def checkAppendRange(
      spark: SparkSession, table: String, loIncl: Long, hiExcl: Long): Unit = {
    require(loIncl < hiExcl, s"empty append range [$loIncl, $hiExcl)")
    val manifest = manifestOf(table)
    if (spark.catalog.tableExists(manifest)) {
      val overlapping = spark.table(manifest)
        .filter(org.apache.spark.sql.functions.col("lo") < hiExcl &&
          org.apache.spark.sql.functions.col("hi") > loIncl)
        .count()
      if (overlapping > 0)
        throw new IllegalStateException(
          s"append range [$loIncl, $hiExcl) overlaps $overlapping already-" +
            s"ingested range(s) of $table — a repeated append would " +
            "double-insert postings; rebuild the index or pick a " +
            "disjoint range")
    }
  }

  /** Run `appends` (every table write of one ingest batch) under the
    * index's exactly-once bracket: the [loIncl, hiExcl) range is
    * overlap-CHECKED before, and RECORDED in the high-water manifest
    * only AFTER every append succeeds, the whole bracket serialized
    * per index by [[appendLocks]]. Recording last closes the ADVICE
    * r15 ordering hole: the old record-first form left a FAILED
    * append's range claimed, so a retry threw 'overlaps' while reads
    * silently missed the range's rows (dropped candidate pairs — real
    * duplicates reported clean). The remaining window is a failure
    * BETWEEN two appends of one batch: those rows sit un-manifested
    * and a retry double-appends the tables that did land. That is
    * detectable but only PARTIALLY loud — buckets past half the
    * read-time cap double across it (dropping candidates wholesale)
    * and the saturation audit's masked share jumps, while small
    * doubled buckets merely inflate candidate counts — so the safe
    * recovery after a mid-batch failure is REBUILD, not retry; the
    * bracket's job is to make the common failure (full-batch retry
    * after a recorded success, or after a failure before any append)
    * exactly-once, and to make the rare mid-batch case diagnosable. */
  def appendExactlyOnce(spark: SparkSession, table: String,
      loIncl: Long, hiExcl: Long)(appends: => Unit): Unit = {
    val lock = appendLocks.computeIfAbsent(manifestOf(table), _ => new Object)
    lock.synchronized {
      checkAppendRange(spark, table, loIncl, hiExcl)
      appends
      val session = spark
      import session.implicits._
      Seq((loIncl, hiExcl)).toDF("lo", "hi")
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .format("parquet").saveAsTable(manifestOf(table))
    }
  }
}
