package graft.tools
import org.apache.spark.sql.SparkSession

/** Scratch stage profiler (dev tool): first arg = sf dir, remaining
  * args = SparkEntry query names (or `name*K` to repeat K times), run
  * in order on one session — for isolating cross-query JVM effects. */
object Profile2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val specs: Seq[(String, Int)] =
      (if (args.length > 1) args.drop(1).toSeq
       else Seq("dedup_minhash_lsh*3", "dedup_simhash*2", "dedup_embedding*2",
         "dedup_substring*2", "dedup_clusters*2", "dedup_clusters_star*1",
         "dedup_survivors*1", "events_funnel*1"))
        .map { s =>
          val cut = s.indexOf('*')
          if (cut < 0) (s, 1) else (s.substring(0, cut), s.substring(cut + 1).toInt)
        }
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    time("warmup-docs")(graft.sources.Tables.documents(spark, dir).count())
    specs.foreach { case (name, k) =>
      (1 to k).foreach { i =>
        time(s"$name#$i")(graft.SparkEntry.queries(name)(spark, dir).count())
      }
    }
    spark.stop()
  }
}
