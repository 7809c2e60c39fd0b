package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch timing for curation_report (dev tool). */
object ProfileCuration {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup")(graft.sources.Tables.documents(spark, dir).count())
    time("survivors-1")(graft.dedup.Dedup.survivors(spark, dir).count())
    time("survivors-2")(graft.dedup.Dedup.survivors(spark, dir).count())
    (1 to 3).foreach { i =>
      time(s"curation-$i")(graft.pipeline.Curation.report(spark, dir).count())
    }
    spark.stop()
  }
}
