package graft

/** Dev tool (test scope, the ProfileMain pattern): A/B the streaming
  * drain's state-store provider — default HDFS-backed map store vs
  * RocksDB — over the same fixed event set, min-of-3 each, so the
  * headline `streaming_throughput` config is a measured choice rather
  * than a default. Also sweeps partitions, the other state-commit
  * multiplier. Run: `sbt "Test/runMain graft.StreamStoreSweepMain"`.
  */
object StreamStoreSweepMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val evs = graft.tools.StreamingThroughput.synthEvents(n)
    def minOf3(chunks: Int, parts: Int, store: Option[String]): Double =
      (1 to 3).map(_ => graft.tools.StreamingThroughput
        .measureOnce(spark, evs, chunks, parts, store)).min
    for {
      parts <- Seq(4, 8, 16)
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
