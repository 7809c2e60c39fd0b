package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew tools for the cases AQE's runtime skew-join split
  * cannot reach (SURVEY §4): AQE splits oversized SHUFFLE partitions of
  * sort-merge joins, but a single hot KEY inside one partition still
  * lands on one task when the operator is an aggregation, and
  * stream-side explosion joins (one hot key matching millions of rows)
  * can want finer control than partition-level splitting.
  *
  * Salting rewrites the computation, not the cluster: the hot side
  * scatters each key over `salts` sub-keys, the other side replicates
  * per salt (a `posexplode` fan-out — its cost is `salts` × the small
  * side), and the result is exact.
  */
object Skew {

  /** Inner equi-join `left ⋈ right` on `key`, with the LEFT side's hot
    * keys scattered over `salts` sub-keys and the RIGHT side replicated
    * once per salt. Exact same result as the plain join; the shuffle
    * key becomes (key, salt) so one hot key spreads over `salts` tasks.
    * Use when `right` is too big to broadcast but small enough to
    * replicate `salts`-fold (dimension-scale), and `left` carries the
    * skew. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // Random salt per left row: spreads a hot key uniformly. The salt
    // is derived, not stored — no schema change leaks to the caller.
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 7L) * salts).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: `df.groupBy(key).agg(sum(value))`
    * where one key may dominate. Phase 1 aggregates on (key, salt) —
    * map-side combine already bounds each task's state, and the hot
    * key's rows split across `salts` reducers; phase 2 merges the
    * `salts` partials per key (tiny). For associative aggregates this
    * is exact. Spark's hash aggregation often makes this unnecessary —
    * measure first; it exists for the window/sort-based shapes where
    * partial aggregation does NOT apply. */
  def saltedSum(
      df: DataFrame, key: String, value: Column, salts: Int,
      out: String = "sum"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    df.withColumn("_salt", (rand(seed = 7L) * salts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(out))
  }
}
