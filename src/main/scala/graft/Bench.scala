package graft
import org.apache.spark.sql.SparkSession
/** Driver-run benchmark main: times every SparkEntry query at the
  * SPARK_GRAFT_SF_DIR scale factor and prints ONE JSON line.
  *
  * Harness rules: each query is run three times and the minimum kept
  * (steady-state cost — codegen compiled, footers cached — with load
  * noise damped); a query that throws reports -1 with its error in the
  * `errors` field rather than benching the elapsed time of the failed
  * attempt as a fast success.
  *
  * Reading the numbers for session-memoized queries (the dedup pair
  * lists / cluster assignments): the min reflects the steady-state
  * cached read — the cost every consumer after the first pays — while
  * the FIRST entry of the published per-attempt array carries the full
  * pipeline materialization. Both are real costs; regressions in the
  * pipeline itself show in attempt 1, not the min.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.sources.Tables.sessionConfs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM (codegen, shuffle machinery) and parquet footers so
    // per-query timings measure the query, not session initialization.
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach { t =>
      try {
        if (t == "events") graft.sources.Tables.events(spark, sfDir).count()
        else graft.sources.Tables(spark, sfDir, t).count()
      } catch { case _: Throwable => () }
    }
    def jsonSafe(s: String): String = s.flatMap {
      case '"' => "'"; case '\\' => "/"
      case c if c < ' ' => " "
      case c => c.toString
    }.take(160)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch { case t: Throwable =>
        Left(jsonSafe(s"${t.getClass.getSimpleName}: ${Option(t.getMessage).getOrElse("")}"))
      }
    }
    // Local-iteration filter — the one definition shared with Verify.
    val rawQueries: Map[String, Seq[Either[String, Double]]] = SparkEntry.selectedQueries.map {
      case (name, fn) => name -> (1 to 3).map(_ => once(fn))
    }
    // Reference-workload throughput (VERDICT r8/r9 #6): the SSTable
    // decode + full-migrate timings ride the same min-of-3 / regression
    // machinery as the queries (fixed cell count, so a time regression
    // IS a throughput regression), and the artifact publishes cells/s
    // so every round carries the matches-the-reference number instead
    // of a one-off SCALE.md table. SPARK_GRAFT_SSTABLE_PARTS=0 skips.
    val ssParts = sys.env.getOrElse("SPARK_GRAFT_SSTABLE_PARTS", "250000").toInt
    val ssGens = 4
    val ssCells = ssParts.toLong * 2 * ssGens
    val ssAttempts: Seq[(Double, Double, Long, Long)] =
      if (ssParts <= 0) Seq.empty
      else scala.util.Try {
        val dir = graft.tools.SSTableThroughput.synthesize(ssParts, ssGens).toString
        graft.tools.SSTableThroughput.warm(spark, dir)
        (1 to 3).map(_ => graft.tools.SSTableThroughput.measureOnce(spark, dir))
      }.getOrElse(Seq.empty)
    val raw: Map[String, Seq[Either[String, Double]]] = rawQueries ++ (
      if (ssAttempts.isEmpty) Map.empty
      else Map(
        "sstable_decode" -> ssAttempts.map(a => Right(a._1): Either[String, Double]),
        "sstable_migrate" -> ssAttempts.map(a => Right(a._2): Either[String, Double])))
    val results: Map[String, Either[String, Double]] = raw.map {
      case (name, attempts) =>
        val times = attempts.collect { case Right(s) => s }
        name -> (if (times.size == attempts.size) Right(times.min)
                 else Left(attempts.collectFirst { case Left(e) => e }.get))
    }
    // Compact per-query times (ms precision) keep the summary line
    // small enough to survive a tail-bounded log capture.
    // Locale-pinned number rendering: the f interpolator uses the JVM
    // default locale, which on comma-decimal locales would print
    // "1,234" inside the JSON and corrupt the artifact.
    def num(s: Double, digits: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(s))
    val qs = results.map {
      case (k, Right(s)) => s""""$k":${num(s, 3)}"""
      case (k, Left(_))  => s""""$k":-1"""
    }.mkString("{", ",", "}")
    // Raw per-attempt wall times: min-of-3 damps load noise only when
    // at least one attempt ran unloaded — publishing the attempts lets
    // a reader see the variance instead of inferring a regression from
    // a single loaded snapshot.
    val attemptsJson = raw.map { case (k, atts) =>
      s"\"$k\":" + atts.map {
        case Right(s) => num(s, 6)
        case Left(_) => "-1"
      }.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val errors = results.collect { case (k, Left(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val nFailed = results.count(_._2.isLeft)
    // Headline total stays query-only (comparable across rounds that
    // predate the sstable rows).
    val total = results.collect {
      case (k, Right(s)) if !k.startsWith("sstable_") => s
    }.sum
    // Median-of-attempts next to the min: min-of-3 with no warmup
    // separation lets a co-tenant spike through unnoticed on the OTHER
    // attempts; the median makes sustained slowness visible where the
    // min hides it.
    val medians: Map[String, Double] = raw.collect {
      case (name, atts) if atts.forall(_.isRight) =>
        val ts = atts.collect { case Right(s) => s }.sorted
        name -> ts(ts.size / 2)
    }
    val mediansJson = medians.map { case (k, m) => s""""$k":${num(m, 3)}""" }
      .mkString("{", ",", "}")
    // Machine-visible regression check (logic in graft.BenchGate, spec'd
    // on a planted slowdown): a query whose new min exceeds 1.5x its
    // prior min is listed with both numbers. The baseline is the
    // COMMITTED full summary of the previous run (bench_prev.json —
    // this run rewrites it below, the round-close commit keeps it);
    // the driver's BENCH_r{N}.json is only a fallback, because its
    // tail capture truncates the summary line and through round 9 the
    // gate silently parsed zero prior queries from it while sustained
    // 5x skews sat in its own attempts array. When NO source parses,
    // the artifact now says "regressed_vs": null instead of naming a
    // file it never actually read.
    def readText(f: java.io.File): String =
      scala.util.Try(scala.io.Source.fromFile(f, "UTF-8").mkString).getOrElse("")
    val prevFile = new java.io.File("bench_prev.json")
    val driverFile = Option(new java.io.File(".").listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("BENCH_r\\d+\\.json"))
      .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
      .lastOption
    val candidates: Seq[(String, Map[String, Double])] =
      (if (prevFile.isFile) Seq(prevFile) else Seq.empty) ++ driverFile.toSeq map { f =>
        f.getName -> BenchGate.parsePrior(readText(f), sfDir)
      }
    val (priorName, priorQueries) = candidates.find(_._2.nonEmpty) match {
      case Some((name, qs)) => (BenchGate.priorLabel(Some(name), qs.size), qs)
      case None => ("null", Map.empty[String, Double])
    }
    val currentMins = results.collect { case (k, Right(s)) => k -> s }.toMap
    val regressed = BenchGate.regressions(currentMins, priorQueries).map {
      case (k, (p, s)) => s""""$k":[${num(p, 3)},${num(s, 3)}]"""
    }.mkString("{", ",", "}")
    // ONE JSON object, one line: the driver parses stdout as a single
    // JSON document, so the per-attempt arrays are nested in the summary
    // rather than emitted as a second line (round-4/5 artifacts came out
    // unparseable from the two-line format). A single JSON line cannot
    // survive truncation from either end; the defenses are size (the
    // whole line is ~10 KB) and the bench_full.json side-file below.
    // Published throughput rows (min-of-3): cells/s and per-core
    // cells/s for decode and the full migrate pipeline — the numbers
    // SCALE.md's reference comparison (447k / 120k per core on
    // local[1]) is tracked against, now re-measured every round.
    val sstableJson =
      if (ssAttempts.isEmpty) "null"
      else {
        val dMin = ssAttempts.map(_._1).min
        val mMin = ssAttempts.map(_._2).min
        val decoded = ssAttempts.head._3
        s"""{"cells":$ssCells,"gens":$ssGens,"threads":$cpus,"decoded":$decoded,""" +
        s""""decode_cells_per_sec":${num(decoded / dMin, 0)},""" +
        s""""decode_cells_per_sec_per_core":${num(decoded / dMin / cpus.toDouble, 0)},""" +
        s""""migrate_cells_per_sec":${num(ssCells / mMin, 0)},""" +
        s""""migrate_cells_per_sec_per_core":${num(ssCells / mMin / cpus.toDouble, 0)}}"""
      }
    val summaryLine =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,"failed":$nFailed,"errors":$errors,"sf":"$sfDir","medians":$mediansJson,"regressed":$regressed,"regressed_vs":$priorName,"sstable":$sstableJson,"attempts":$attemptsJson}"""
    // Belt and braces: the artifact also lands in files next to the
    // build, immune to any stdout truncation. bench_full.json is the
    // gitignored scratch copy; bench_prev.json is COMMITTED at round
    // close and is what the next run's regression gate diffs against
    // (written after the comparison above, so a run never diffs
    // against itself). A SPARK_GRAFT_ONLY-filtered debug run or a
    // full run at a different scale factor must NOT rewrite the
    // committed baseline (decision + rationale in
    // BenchGate.shouldPersistBaseline, spec'd on both clobber paths).
    val fullRun = sys.env.get("SPARK_GRAFT_ONLY").isEmpty
    val prevText = if (prevFile.isFile) Some(readText(prevFile)) else None
    val outFiles =
      if (BenchGate.shouldPersistBaseline(fullRun, prevText, sfDir))
        Seq("bench_full.json", "bench_prev.json")
      else Seq("bench_full.json")
    outFiles.foreach { name =>
      scala.util.Try {
        val w = new java.io.PrintWriter(name, "UTF-8")
        try w.println(summaryLine) finally w.close()
      }
    }
    println(summaryLine)
    spark.stop()
  }
}
