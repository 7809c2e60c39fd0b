package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact.{dsum, pres}
import graft.sources.Tables

/** Event-stream analytics (SURVEY.md §2.3) over the `events` table.
  *
  * All three operators shuffle exactly once, on `user_id` (or on the
  * group keys for the windowed agg): sessionization and as-of are
  * window-function plans over the per-user partition, so the sort that
  * the window needs is per-partition and never global. At 100 TB the
  * same plans hold — the per-user event sequence is the unit of
  * locality, and AQE handles user-skew by splitting oversized
  * partitions before the sort.
  */
object Events {

  /** #30 events_windowed_agg: tumbling 1-hour windows per event type.
    * Uses Spark's `window()` (the same construct the streaming variant
    * uses, so batch and stream share plan shape); epoch-aligned, so the
    * SQL oracle is `date_trunc('hour', ts)`. */
  def windowedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        pres(dsum(col("value"), 2)).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        col("w.start").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"), col("n_users"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sessionized events: a session breaks after a gap > `gapMinutes`
    * between a user's consecutive events. Two stacked windows over the
    * same (user_id × ts) partitioning — one shuffle, one sort. */
  def sessionized(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
             unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L,
          1L).otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
  }

  /** #31 events_sessionize: gap-based sessions (30-min gap), one row per
    * session with span and activity stats. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionized(Tables.events(spark, dir), gapMinutes = 30)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        pres(dsum(col("value"), 2)).as("sum_value"))
      .orderBy(col("user_id"), col("session_seq"))

  /** #32 events_asof_prev: each event joined to the user's previous
    * event (the as-of-prior row in the same series) — previous type,
    * previous value, and the inter-event gap in microseconds. */
  def asofPrev(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(col("prev_ts")))
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        col("prev_type"), col("prev_ts"), col("gap_us"))
      .orderBy(col("user_id"), col("event_id"))
  }
}
