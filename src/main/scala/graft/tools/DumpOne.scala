package graft.tools
import org.apache.spark.sql.SparkSession
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, dir, out) = args
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder().master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries(name)(spark, dir)
      .coalesce(1).write.mode("overwrite").parquet(out)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$out/oracle.sql"),
      graft.SparkEntry.oracleSql(name))
    spark.stop()
  }
}
