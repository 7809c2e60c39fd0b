package graft.tools

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.{KeyedSink, KeyedWriter}

/** Write-side throughput measurement for the per-round [[graft.Bench]]
  * artifact (VERDICT r12 stretch #8): `sstable_migrate` benches the
  * READ side (decode → k-way LWW merge → policy → parquet export);
  * the create-only KeyedWriter loop — the reference's AerospikeWriter
  * seam (KeyedSink.createOnlyForeach) — had fault-injection specs but
  * no tracked rows/s number, so a regression in the export machinery
  * (the TTL/exists annotation joins, the per-partition writer loop,
  * the retry bookkeeping) would have shipped silently. One
  * `keyed_export` row now rides the same min-of-3 machinery.
  *
  * What is measured: a fixed synthetic record set pushed through the
  * FULL createOnlyForeach pipeline — TTL policy flagging (~5% planted
  * expired + ~2% planted eternal under prohibitEternal), a 10%
  * existing-keys anti-join annotation, then the per-partition
  * open/write/retry/close loop against an in-memory writer that reads
  * every record's fields (forcing full row materialization, the real
  * per-record cost a store client pays) and plants a transient
  * failure every 5000th record so the retry path is always on the
  * measured path. The store round-trip itself is deliberately NOT
  * simulated (no sleep): the number is the Spark-side export
  * machinery's ceiling — what the engine adds on top of whatever the
  * target store can absorb.
  *
  * Determinism: the record set is a pure function of `n` (arithmetic
  * keys/values/expiries), so a time regression IS an export-machinery
  * regression — the sstable and streaming rows' contract.
  */
object KeyedExportThroughput {

  /** Fixed "now" so the planted expiry pattern never drifts. */
  val NowUs: Long = 1700000000000000L

  /** The fixed record set: key/value columns plus the expiry/ttl pair
    * the TTL policy reads. Every 20th record is already expired, every
    * 50th is eternal (dropped under prohibitEternal), the rest expire
    * comfortably in the future. */
  def synthRecords(spark: SparkSession, n: Int): DataFrame = {
    spark.range(n.toLong).select(
      format_string("key-%09d", col("id")).as("key"),
      concat(lit("payload-"), col("id")).as("value"),
      (col("id") % 7).as("nclicks"),
      when(col("id") % 20 === 0, lit(NowUs - 1000L))
        .when(col("id") % 50 === 0, lit(null).cast("long"))
        .otherwise(lit(NowUs) + lit(86400000000L) + col("id")).as("expiry_us"),
      when(col("id") % 50 === 0, lit(null).cast("long"))
        .otherwise(lit(86400000000L)).as("ttl_us"))
  }

  /** The target's current key set: every 10th key already exists, so
    * the create-only anti-join annotation does real work. */
  def existingKeys(spark: SparkSession, n: Int): DataFrame =
    spark.range(0, n.toLong, 10L)
      .select(format_string("key-%09d", col("id")).as("key"))

  /** In-memory writer with the per-record work a store client pays
    * before the network: read every field of the record (forces the
    * row materialization the RDD loop hands it) and fold them into a
    * checksum the outcome depends on (so the JIT cannot elide the
    * reads). Every 5000th record fails once transiently — the retry
    * path stays on the measured path. */
  final class MeasuredWriter extends KeyedWriter {
    override def write(row: Row): KeyedWriter.Outcome = {
      val key = row.getAs[String]("key")
      val value = row.getAs[String]("value")
      val n = row.getAs[Long]("nclicks")
      var h = key.length * 31 + value.length
      h = h * 31 + n.toInt
      // id ≡ 1 (mod 5000): odd, so never expired/eternal/existing —
      // the planted failure always reaches the writer.
      val id = key.substring(4).toLong
      if (id % 5000 == 1 && !retriedOnce.contains(id)) {
        retriedOnce.add(id); KeyedWriter.Failed
      } else if (h == Int.MinValue) KeyedWriter.Failed // unreachable; pins h live
      else KeyedWriter.Written
    }
    // Per-task-instance replay memory for the planted transient
    // failures (the writer is serialized per partition, so this set
    // is partition-local and bounded at n/5000).
    private val retriedOnce = new java.util.HashSet[Long]()
  }

  /** One timed export; returns (wall seconds, stats) so the caller can
    * assert the planted accounting (expired/existing/retried) landed
    * where the policy says. Fresh writer per call — min-of-3 attempts
    * are independent. */
  def measureOnce(spark: SparkSession, records: DataFrame,
      existing: DataFrame): (Double, KeyedSink.WriteStats) = {
    val t0 = System.nanoTime()
    val stats = KeyedSink.createOnlyForeach(
      spark, records, new MeasuredWriter,
      policy = Some(KeyedSink.TtlPolicy(
        minTtlUs = 1000L, prohibitEternal = true, nowUs = NowUs)),
      existingKeys = Some(existing))
    ((System.nanoTime() - t0) / 1e9, stats)
  }
}
