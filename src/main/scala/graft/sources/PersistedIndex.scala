package graft.sources

import org.apache.spark.sql.SparkSession

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

  /** Record an append's [loIncl, hiExcl) bucket range in the index's
    * high-water manifest, REFUSING an overlap loudly (the Kv.migrate
    * -W discipline applied to batch ingest). Why loud and not silent:
    * a repeated or overlapping append double-inserts rows, and under
    * a READ-time bucket cap a doubled bucket crosses the cap and is
    * dropped wholesale — real duplicates would then be reported as
    * clean (review r15). Exactly-once therefore lives HERE, at the
    * ingest boundary, where the range either records or throws. */
  def recordAppendRange(
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
    val session = spark
    import session.implicits._
    Seq((loIncl, hiExcl)).toDF("lo", "hi")
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .format("parquet").saveAsTable(manifest)
  }
}
