package graft

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Dev tool (test scope, like ProfileMain): measures the byte-level
  * SSTable migrate throughput — the reference's ACTUAL workload
  * (Data.db decode → k-generation LWW merge → create-only export) —
  * against its single-node rows/s class. Synthesizes `gens` "ma"
  * Data.db generation files of `parts` partitions × 2 cells sharing
  * the same key space (so the LWW merge does real work), then times
  * (a) the raw DataSource V2 decode and (b) the full Kv.migrate to a
  * parquet target. Prints one JSON line.
  *
  * Run: sbt "Test/runMain graft.SSTableBenchMain [parts] [gens] [threads]"
  */
object SSTableBenchMain {

  private def vint(out: DataOutputStream, v: Long): Unit = {
    require(v >= 0)
    if (v < 0x7f) { out.writeByte(v.toInt); return }
    var extra = 1
    while (extra < 8 && (v >>> (7 - extra + 8 * extra)) != 0) extra += 1
    val mask = (0xff << (8 - extra)) & 0xff
    out.writeByte(mask | (v >>> (8 * extra)).toInt)
    var i = extra - 1
    while (i >= 0) { out.writeByte(((v >>> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  def main(args: Array[String]): Unit = {
    val parts = args.headOption.map(_.toInt).getOrElse(250000)
    val gens = args.lift(1).map(_.toInt).getOrElse(16)
    val threads = args.lift(2).getOrElse("16")
    val dir = Files.createTempDirectory("sstable_bench")

    // Synthesize: per generation g, every partition key carries one row
    // (HAS_TIMESTAMP | HAS_ALL_COLUMNS) with a text and a long cell at
    // row ts = g*1000 — later generations win the LWW merge.
    (1 to gens).foreach { g =>
      val out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(dir.resolve(s"ma-$g-big-Data.db").toFile), 1 << 20))
      val value = s"payload-$g-0123456789".getBytes(UTF_8)
      var i = 0
      while (i < parts) {
        val key = f"user-$i%08d".getBytes(UTF_8)
        out.writeShort(key.length); out.write(key)        // partition key
        out.writeInt(Int.MaxValue)                        // local deletion
        out.writeLong(graft.sources.sstable.MaFormat.NoDeletion)
        out.writeByte(0x04 | 0x20)                        // row flags
        vint(out, 0); vint(out, 0)                        // row/prev size
        vint(out, g * 1000L)                              // row ts delta
        out.writeByte(0x08); vint(out, value.length); out.write(value)
        out.writeByte(0x08)                               // long cell, row ts
        out.writeLong(i.toLong * g)
        out.writeByte(0x01)                               // end of partition
        i += 1
      }
      out.close()
    }

    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder().master(s"local[$threads]")
        .config("spark.sql.shuffle.partitions", threads)
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = "click:text,nclicks:long"
    val totalCells = parts.toLong * 2 * gens

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    // Warm (codegen, classloading) on a single generation.
    graft.kv.Kv.cellsFromSSTables(spark, dir.toString, spec).limit(1000).count()

    val (decoded, tDecode) = time(
      graft.kv.Kv.cellsFromSSTables(spark, dir.toString, spec).count())
    val target = Files.createTempDirectory("sstable_bench_out").resolve("t").toString
    val (stats, tMigrate) = time(
      graft.kv.Kv.migrate(spark, Seq(dir.toString), spec, target)
        .toOption.get)
    def num(d: Double) =
      String.format(java.util.Locale.ROOT, "%.0f", Double.box(d))
    println(
      s"""{"metric":"sstable_migrate","cells":$totalCells,"gens":$gens,"threads":$threads,""" +
      s""""decode_sec":${num(tDecode * 1000) .toDouble / 1000},"decoded":$decoded,""" +
      s""""decode_cells_per_sec":${num(decoded / tDecode)},""" +
      s""""decode_cells_per_sec_per_core":${num(decoded / tDecode / threads.toDouble)},""" +
      s""""migrate_sec":${num(tMigrate * 1000).toDouble / 1000},""" +
      s""""migrate_cells_per_sec":${num(totalCells / tMigrate)},""" +
      s""""migrate_cells_per_sec_per_core":${num(totalCells / tMigrate / threads.toDouble)},""" +
      s""""exported":${stats.written}}""")
    spark.stop()
  }
}
