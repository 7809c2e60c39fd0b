package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout helpers: pre-shuffling fact tables into a bucketed,
  * sorted-by-key layout so repeated joins/aggregations on that key run
  * with NO exchange at read time.
  *
  * This is the 100 TB lever for the engine's KV workloads: a cell store
  * bucketed by `key` makes every LWW compaction, tombstone merge, and
  * create-only anti-join a zero-shuffle operation — the shuffle is paid
  * once at ingest, then amortized over every subsequent query, exactly
  * the economics of the reference's token-ordered SSTable layout
  * (sorted runs paid at flush/compaction, consumed by every read).
  */
object Bucketing {

  /** Write `df` as a bucketed + in-bucket-sorted managed table. */
  def writeBucketed(
      df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Append a batch to an EXISTING bucketed table with the same spec —
    * the ingest path of an appendable index (Dedup.appendIncrement):
    * the shuffle is batch-sized, existing files are untouched, and
    * readers see the union with the bucketed layout intact (each
    * append adds one file per bucket; in-file sort order holds
    * per file, which is all the bucketed-join machinery needs). */
  def appendBucketed(
      df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Append)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — with matching
    * bucket counts the join requires no Exchange on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
