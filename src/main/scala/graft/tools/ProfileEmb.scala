package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for dedup_embedding (dev tool). */
object ProfileEmb {
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
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
    time("emb-count")(emb.count())

    val banded = emb.select(
      col("vec_id"), col("embedding"),
      posexplode(array((0 until 4).map(t =>
        graft.functions.Sketches.hyperplaneBits(col("embedding"), seed = t + 1, nbits = 8, dim = 64)): _*)))
      .select(col("vec_id"), col("embedding"),
        col("pos").as("table_id"), col("col").as("bucket"))
    time("banded")(banded.count())
    val okBuckets = banded
      .groupBy(col("table_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 500))
      .select(col("table_id"), col("bucket"))
    time("okBuckets")(okBuckets.count())
    val pruned = banded.join(okBuckets, Seq("table_id", "bucket"), "left_semi")
    time("pruned")(pruned.count())
    val pairs = pruned
      .join(
        pruned.select(col("table_id"), col("bucket"),
          col("vec_id").as("cand_id"), col("embedding").as("cand_emb")),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("cand_id"))
      .dropDuplicates("vec_id", "cand_id")
      .select(col("vec_id"), col("cand_id"),
        graft.functions.Sketches.cosineSim(col("embedding"), col("cand_emb")).as("cos"))
    time("pairs")(pairs.count())
    val best = pairs
      .groupBy(col("vec_id"))
      .agg(
        countDistinct(col("cand_id")).as("n_candidates"),
        max(struct(col("cos"), col("cand_id"))).as("best"))
    time("best")(best.count())
    time("best-again")(best.count())
    time("best-checkpoint")(best.localCheckpoint().count())
    time("full-query")(graft.dedup.Dedup.embedding(spark, dir).count())
    time("full-query-2")(graft.dedup.Dedup.embedding(spark, dir).count())
    spark.stop()
  }
}
