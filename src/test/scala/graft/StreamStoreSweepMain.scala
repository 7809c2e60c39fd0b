package graft

/** Dev tool (test scope, the ProfileMain pattern): A/B the streaming
  * drain's state-store provider — default HDFS-backed map store vs
  * RocksDB — and the stateful-shuffle partition count over the same
  * fixed event set, min-of-3 each, so the headline
  * `streaming_throughput` config is a measured choice rather than a
  * default. Args: [nEvents] [cpus]; the session is built at `cpus`
  * (default 32) to match the bench box, NOT the 4-thread test session
  * — partition economics at 4 cores do not transfer.
  * Run: `sbt "Test/runMain graft.StreamStoreSweepMain"`.
  */
object StreamStoreSweepMain {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("state")) return stateSweep(args)
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val evs = graft.tools.StreamingThroughput.synthEvents(n)
    def minOf3(chunks: Int, parts: Int, store: Option[String]): Double =
      (1 to 3).map(_ => graft.tools.StreamingThroughput
        .measureOnce(spark, evs, chunks, parts, store)).min
    for {
      parts <- Seq(2, 4, 8, 16)
      (name, store) <- Seq(
        "hdfs" -> None,
        "rocksdb" -> Some(graft.tools.StreamingThroughput.RocksDbProvider))
    } {
      val secs = minOf3(8, parts, store)
      println(f"[store-sweep] store=$name%-8s parts=$parts%2d " +
        f"secs=$secs%.3f events_per_sec=${(n / secs).toLong}")
    }
    spark.stop()
  }

  /** The STATE-SIZE axis (VERDICT r13 #5: "RocksDB's rejection is only
    * valid at this state size"): scale distinct users — session and
    * z-score keys scale with users, dedup entries with resident event
    * ids (fewer 3-hour evictions at high users/n) — and publish, per
    * (users, store), the measured state bytes and wall seconds, so the
    * map-store-vs-RocksDB recommendation is a measured crossover curve
    * rather than a few-MB-state extrapolation. Run:
    * `sbt "Test/runMain graft.StreamStoreSweepMain state [cpus]
    * [onlyUsers] [onlyStore]"` — the optional filters re-run a single
    * cell (the r15 crash-free confirmation of the 2M-user RocksDB
    * cell after the JNI-logger pin). */
  private def stateSweep(args: Array[String]): Unit = {
    val cpus = args.lift(1).map(_.toInt).getOrElse(32)
    val onlyUsers = args.lift(2).map(_.toInt)
    val onlyStore = args.lift(3)
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(org.apache.spark.sql.SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 5 events/user: at low users the 20-round blocks evict dedup
    // state (the headline regime); past users=80k there is no 3-hour
    // jump left, so every event id stays resident — state grows
    // linearly with n while per-event work is constant, which is
    // exactly the regime the crossover question asks about.
    for {
      users <- Seq(2000, 20000, 200000, 1000000, 2000000)
        if onlyUsers.forall(_ == users)
      n = users * 5
      (name, store) <- Seq(
        "hdfs" -> None,
        "rocksdb" -> Some(graft.tools.StreamingThroughput.RocksDbProvider))
        if onlyStore.forall(_ == name)
    } {
      val evs = graft.tools.StreamingThroughput.synthEvents(n, users)
      val stats = (1 to 2).map(_ => graft.tools.StreamingThroughput
        .measureStatsOnce(spark, evs, chunks = 8, partitions = 8, store))
        .minBy(_.secs)
      println(f"[state-sweep] store=$name%-8s users=$users%8d n=$n%8d " +
        f"state_mb=${stats.stateBytes / 1e6}%9.1f secs=${stats.secs}%8.3f " +
        f"events_per_sec=${(n / stats.secs).toLong}%8d " +
        f"commit_ms=${stats.stateCommitMs}%7d update_ms=${stats.stateUpdateMs}%7d")
    }
    spark.stop()
  }
}
