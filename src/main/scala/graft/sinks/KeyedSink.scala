package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Create-only keyed sink: the Spark-native form of the reference's
  * export path (AerospikeWriter.cpp — async pipelined writes with
  * AS_POLICY_EXISTS_CREATE, TTL policies, per-run statistics).
  *
  * The reference enforces create-only per record against a live store;
  * in a lake-house target the same contract is an anti-join against the
  * target's current keys followed by an append — idempotent, and at
  * 100 TB the join is a shuffle (or broadcast, when the target key set
  * is small) rather than a per-record network round-trip, with the
  * target scan pruned to the key column only. Statistics come from ONE
  * aggregation over the annotated frame plus the write pass itself —
  * the incoming data is scanned twice total, never per-statistic.
  *
  * TTL policies mirror the reference flags:
  *  - `minTtlUs` (`-L`): records expiring sooner than this are dropped;
  *  - `prohibitEternal` (`-x`): records with no expiry are dropped;
  *  - `recordTtlFromFirst` (`-f`): a record (key group) expires at its
  *    first-expiring cell rather than its last.
  */
object KeyedSink {

  /** Per-run statistics, matching the reference's end-of-run printf
    * (Cassandra2Aerospike.cpp do_transfer). */
  case class WriteStats(
      incoming: Long, written: Long, skippedExisting: Long, expired: Long,
      // Cells whose winning version was a cell-tombstone, dropped before
      // export (the reference's skipped-deleted counter,
      // CassandraParser.cpp:524). Populated by Kv.migrate, not the sink.
      deletedDropped: Long = 0L,
      // Surviving records at or below an incremental run's `-W`
      // watermark, skipped before export (already shipped by the
      // previous run). Populated by Kv.migrate, not the sink.
      skippedUnchanged: Long = 0L)

  case class TtlPolicy(
      minTtlUs: Long = 0L,
      prohibitEternal: Boolean = false,
      recordTtlFromFirst: Boolean = false,
      nowUs: Long)

  /** Expiry predicate for one cell row; null expiry_us = eternal. */
  private def cellLive(policy: TtlPolicy) = {
    val base = col("expiry_us").isNull ||
      (col("expiry_us") > policy.nowUs && col("ttl_us") >= policy.minTtlUs)
    if (policy.prohibitEternal) base && col("expiry_us").isNotNull else base
  }

  /** Annotate incoming rows with a `_live` flag under the policy. */
  def withLiveFlag(incoming: DataFrame, policy: TtlPolicy): DataFrame = {
    val flagged = incoming.withColumn("_live", cellLive(policy))
    if (!policy.recordTtlFromFirst) flagged
    else {
      // Record expires with its FIRST expiring cell: a key group whose
      // earliest expiry has passed is dead wholesale. Windowed min over
      // the key partition — rides one hash shuffle.
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
      flagged.withColumn("_first_expiry", min(col("expiry_us")).over(w))
        .withColumn("_live",
          col("_live") &&
            (col("_first_expiry").isNull || col("_first_expiry") > policy.nowUs))
        .drop("_first_expiry")
    }
  }

  /** Create-only append of `incoming` into the parquet table at
    * `targetPath`, keyed by the `key` column: rows whose key already
    * exists in the target are skipped (never updated), exactly
    * AS_POLICY_EXISTS_CREATE. Returns the run's statistics. */
  def createOnlyAppend(
      spark: SparkSession,
      incoming: DataFrame,
      targetPath: String,
      policy: Option[TtlPolicy] = None): WriteStats = {
    val flagged = policy.map(withLiveFlag(incoming, _))
      .getOrElse(incoming.withColumn("_live", lit(true)))

    val targetExists = {
      val p = new org.apache.hadoop.fs.Path(targetPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    val annotated = (
      if (!targetExists) flagged.withColumn("_exists", lit(false))
      else {
        // Key-only scan of the target (column-pruned), then existence flag.
        val existingKeys = spark.read.parquet(targetPath)
          .select(col("key")).distinct().withColumn("_exists", lit(true))
        flagged.join(existingKeys, Seq("key"), "left_outer")
          .withColumn("_exists", coalesce(col("_exists"), lit(false)))
      }
    ).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // Create-only applies at RECORD (= key) granularity: multiple rows
    // of one key within a batch are the record's cells and land
    // together; a key already in the target skips wholesale. Rows of
    // the same key arriving in LATER batches are skipped by the
    // anti-join — exactly the reference's RECORD_EXISTS behavior.
    // `annotated` is persisted so the stats action and the write
    // action evaluate the target key scan + join once, not twice.
    try {
      val s = annotated.agg(
        count(lit(1)).as("incoming"),
        sum(when(!col("_live"), 1L).otherwise(0L)).as("expired"),
        sum(when(col("_live") && col("_exists"), 1L).otherwise(0L)).as("skipped"),
        sum(when(col("_live") && !col("_exists"), 1L).otherwise(0L)).as("written")
      ).collect().head

      annotated.filter(col("_live") && !col("_exists"))
        .drop("_live", "_exists")
        .write.mode(SaveMode.Append).parquet(targetPath)

      WriteStats(
        incoming = s.getLong(0), written = s.getLong(3),
        skippedExisting = s.getLong(2), expired = s.getLong(1))
    } finally annotated.unpersist()
  }
}
