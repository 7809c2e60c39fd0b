package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Session-memo footprint policy at the stage boundary (same knob
    // as Bench): a 151-query dump session accumulates checkpointed
    // memo frames; past the cap they are dropped and the next
    // consumer rebuilds. High-water mark goes to stderr so a degraded
    // run carries its own attribution.
    val memoCap = sys.env.getOrElse("SPARK_GRAFT_MEMO_CAP_BYTES", s"${8L << 30}").toLong
    var retainedHw = 0L
    // Local-iteration filter — the one definition shared with Bench.
    // Per-query wall seconds land in outDir/verify_times.json so a
    // scale pass (the sf1 sweep) yields its timing table and its
    // correctness artifact from ONE run (VERDICT r13 #5: the sf1
    // table and the artifact must not come from separate sessions).
    val times = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.selectedQueries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        times(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      val retained = scala.util.Try(
        graft.functions.SessionScopedCache.retainedBytes(spark)).getOrElse(0L)
      retainedHw = math.max(retainedHw, retained)
      if (retained > memoCap) {
        // Largest-first down to the cap (ADVICE r11): remaining dumps
        // keep every memo the cap allows instead of rebuilding all.
        val n = graft.functions.SessionScopedCache.evictToCap(spark, memoCap)
        System.err.println(s"[verify] memo cap: evicted $n entries at $retained bytes")
      }
    }
    System.err.println(s"[verify] retained high-water: $retainedHw bytes")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Locale.ROOT: a comma-decimal JVM locale would render 0,123 and
    // break the driver's json.load (Bench.scala pins ROOT for the
    // same reason — ADVICE r14).
    val timesJson = times
      .map { case (k, s) =>
        s"${q(k)}: ${String.format(java.util.Locale.ROOT, "%.3f", Double.box(s))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/verify_times.json"), timesJson)
    spark.stop()
  }
}
