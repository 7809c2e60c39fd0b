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
}
