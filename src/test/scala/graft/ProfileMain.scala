package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling harness (test scope, never shipped): times the
  * stages of whichever operators are under optimization this round. */
object ProfileMain {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime; val n = f
      println(f"PROF $name%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s  rows=$n")
    }
    graft.sources.Tables.lineitem(spark, dir).count()
    graft.sources.Tables.part(spark, dir).count()
    graft.sources.Tables.orders(spark, dir).count()
    graft.sources.Tables.documents(spark, dir).count()
    val li = graft.sources.Tables.lineitem(spark, dir)
    val part = graft.sources.Tables.part(spark, dir).select(col("p_partkey"), col("p_brand"))
    val joined = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
    time("joined.count")(joined.count())
    val sets = joined.groupBy(col("l_orderkey")).agg(sort_array(collect_set(col("p_brand"))).as("bs"))
    time("sets.count")(sets.count())
    val pairs = sets.select(explode(expr(
      "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))")).as("p"))
      .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)).as("n_both"))
    time("pairs.count")(pairs.count())
    time("basket full")(graft.operators.Relational.basketPairs(spark, dir).count())
    time("basket again")(graft.operators.Relational.basketPairs(spark, dir).count())
    val o = graft.sources.Tables.orders(spark, dir)
    val per = o.groupBy(col("o_custkey")).agg(max(col("o_orderdate")).as("last_d"),
      count(lit(1)).as("frequency"),
      sum(round(col("o_totalprice") * 100, 0).cast("long")).as("monetary_cents"))
    time("per.count")(per.count())
    time("rfm full")(graft.operators.Relational.rfmScores(spark, dir).count())
    time("rfm again")(graft.operators.Relational.rfmScores(spark, dir).count())
    time("colloc full")(graft.text.Text.collocations(spark, dir).count())
    time("colloc again")(graft.text.Text.collocations(spark, dir).count())
    spark.stop()
  }
}
