package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (test scope, never shipped): times the
  * stages of whichever operators are under optimization this round.
  * Currently: dedup_lsh_curve's stage decomposition at an arbitrary
  * sf dir (the sf3 super-linear investigation).
  */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf3")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROF $name%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s  rows=$n")
    }
    import graft.functions.Sketches
    val docs = graft.sources.Tables.documents(spark, dir)
    time("docs scan")(docs.count())
    val sh = docs.select(col("doc_id"), graft.dedup.Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles")(sh.count())
    val sigsPlan = sh.select(col("doc_id"), Sketches.minhashSigs(col("sh"), 128).as("sig"))
    time("minhash sigs")(sigsPlan.count())
    val sigs = { val t0 = System.nanoTime
      val s = sigsPlan.localCheckpoint()
      println(f"PROF sig checkpoint          ${(System.nanoTime - t0) / 1e9}%8.3f s")
      s }
    Seq(8, 16, 32).foreach { b =>
      val banded = sigs.select(col("doc_id"),
        posexplode(Sketches.bandHashes(col("sig"), b)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
      time(s"banded b=$b")(banded.count())
      val buckets = banded.groupBy(col("band"), col("band_key"))
        .agg(graft.functions.CollectSetLimit
          .collectSetLimit(col("doc_id"), 200).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      time(s"buckets b=$b")(buckets.count())
      val cand = buckets
        .select(explode(graft.functions.Sketches.sortedPairs(col("ids"))).as("p"))
        .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      time(s"pairs(pre-distinct) b=$b")(cand.count())
      time(s"pairs(distinct) b=$b")(cand.distinct().count())
    }
    time("lsh_curve full")(graft.dedup.Dedup.lshCurve(spark, dir).count())
    time("lsh_curve again")(graft.dedup.Dedup.lshCurve(spark, dir).count())
    spark.stop()
  }
}
