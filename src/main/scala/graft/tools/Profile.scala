package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler (dev tool, not part of the driver contract). */
object Profile {
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
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup
    time("warmup-read")(graft.sources.Tables.documents(spark, dir).count())
    time("warmup-lineitem")(graft.sources.Tables.lineitem(spark, dir).count())

    import graft.dedup.Dedup
    val docs = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
    time("shingles-forced")(docs.agg(sum(size(col("sh")))).collect().head.getLong(0))
    time("tokens-forced")(graft.sources.Tables.documents(spark, dir)
      .select(split(lower(col("text")), "\\s+").as("t")).agg(sum(size(col("t")))).collect().head.getLong(0))
    val sigs = docs.select(col("doc_id"), col("sh"),
      graft.functions.Sketches.minhashSigs(col("sh"), 128).as("sig"))
    time("sigs-forced")(sigs.agg(sum(size(col("sig")))).collect().head.getLong(0))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(31)),
        b => hash(slice(col("sig"), b * 4 + 1, lit(4)), b))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
    time("banded")(banded.count())
    val grouped = banded.groupBy(col("band"), col("band_key"))
      .agg(array_sort(collect_set(col("doc_id"))).as("ids"))
      .filter(size(col("ids")).between(2, 200))
    time("grouped")(grouped.count())
    val pairs = grouped.select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b => struct(a.as("a"), b.as("b")))))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b")).distinct()
    time("pairs")(pairs.count())
    time("minhash-full")(Dedup.minhashLsh(spark, dir).count())
    time("minhash-full-2nd")(Dedup.minhashLsh(spark, dir).count())
    time("ngram-full")(Dedup.ngramJaccard(spark, dir).count())
    time("simhash-full")(Dedup.simhash(spark, dir).count())
    time("approx-distinct")(graft.operators.Relational.approxDistinct(spark, dir).count())
    spark.stop()
  }
}
