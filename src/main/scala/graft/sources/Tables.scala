package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Table registry for the graft engine.
  *
  * Contract: every table is a columnar scan that supports filter and
  * projection pushdown (parquet today; any DataSource V2 source later).
  * Callers never hand-roll paths, so swapping the storage layer (or
  * pointing at a 100 TB bucketed layout) is a one-line change here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  /** Session configs every graft session needs; apply at session BUILD
    * (a table accessor must not mutate shared session state). Today:
    * `events.parquet` stores INT64 TIMESTAMP(NANOS), which the Spark
    * parquet reader rejects unless nanos are read as long. */
  val sessionConfs: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")

  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS), which the
    * Spark parquet reader rejects. Read nanos as long (see
    * [[sessionConfs]], required at session build) and normalize to a
    * microsecond TimestampType column (sub-µs components are zero in
    * this dataset; `div` keeps the arithmetic in exact integer space —
    * a double division would lose precision on 1.7e18-scale values).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
