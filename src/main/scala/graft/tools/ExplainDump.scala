package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps the formatted physical plans of the headline queries to a
  * markdown file — the explain-audit artifact behind the plan-shape
  * test suite (dev tool).
  *
  * Usage: `runMain graft.tools.ExplainDump [sfDir] [out] [only]`.
  * With no `only`, regenerates the whole artifact. With `only` (a
  * comma-separated query list), regenerates JUST those sections and
  * splices them into the existing file — the one-operator workflow:
  * a new operator's commit carries a PLANS.md diff that is exactly
  * that operator's section. Full regeneration remains the periodic
  * honesty pass (a few sections are AQE-racy — the FINAL plan can
  * legitimately differ run-to-run when stage completion order changes
  * a runtime re-plan — so whole-file diffs may carry a handful of
  * unrelated-section changes; that is the executed-plan truth, not
  * noise to suppress).
  */
object ExplainDump {

  /** Rewrites SESSION-GLOBAL unstable tokens — Catalyst expression ids
    * (`name#123`), checkpoint RDD ids (`RDD[451]`), broadcast
    * `plan_id=` tags, AQE query-stage ids, JVM identity hashes,
    * whole-stage codegen ids — to per-plan first-appearance sequences
    * (`#x1, #x2, …`). The raw ids are global counters over the whole
    * dump session, so before this, adding ONE operator renumbered
    * every section that dumps after it alphabetically (~15k-line
    * diffs for a 50-line operator — VERDICT r12 #2); normalized, a
    * one-operator commit diffs only that operator's section.
    * Within-plan id EQUALITY is preserved (same raw id → same xN), so
    * the dump still shows which columns flow where; only the
    * arbitrary global numbering is dropped. */
  private[graft] def normalize(plan: String): String = {
    def renumber(s: String, re: scala.util.matching.Regex,
        fmt: Int => String): String = {
      val ids = scala.collection.mutable.LinkedHashMap.empty[String, Int]
      re.replaceAllIn(s, m => scala.util.matching.Regex.quoteReplacement(
        fmt(ids.getOrElseUpdate(m.group(1), ids.size + 1))))
    }
    var out = renumber(plan, "#(\\d+)".r, i => s"#x$i")
    out = renumber(out, "RDD\\[(\\d+)\\]".r, i => s"RDD[x$i]")
    out = renumber(out, "plan_id=(\\d+)".r, i => s"plan_id=x$i")
    // JVM identity hashes from array-literal Expression arguments
    // (e.g. `[[D@7abeaed0` in the centroid kernels) and whole-stage
    // codegen ids both vary run-to-run with no information content.
    out = renumber(out, "@([0-9a-f]{6,})".r, i => s"@x$i")
    out = renumber(out, "codegen id : (\\d+)".r, i => s"codegen id : x$i")
    // QueryStage detail blocks carry the session-global stage id as a
    // bare `Arguments: N` line — renumber ONLY those (a bare-int
    // Arguments elsewhere, e.g. a limit, is query content and must
    // survive). The block shape is `(k) <kind>QueryStage` followed by
    // Output/Input lines, then the Arguments line.
    val stageIds = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val stageRe =
      "(?m)(?<=QueryStage\\n)((?:(?:Output|Input) \\[.*\\n)*Arguments: )(\\d+)$".r
    stageRe.replaceAllIn(out, m => scala.util.matching.Regex.quoteReplacement(
      m.group(1) + "x" + stageIds.getOrElseUpdate(m.group(2), stageIds.size + 1)))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("docs/PLANS.md")
    val only = args.lift(2).map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = graft.sources.Tables.sessionConfs
      .foldLeft(SparkSession.builder().master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // The FULL query surface (sorted): a partial headline list left a
    // third of the plans unaudited through round 6; the exchange-budget
    // gate in PlanSpec now pins every one of these, and this artifact
    // is the human-readable record behind it.
    val all = graft.SparkEntry.queries.keys.toSeq.sorted
    val headline = only match {
      case Some(names) =>
        val unknown = names -- all.toSet
        require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
        all.filter(names)
      case None => all
    }

    def section(name: String, df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // finalize AQE so the dumped plan is the executed one
      s"\n## $name\n\n```\n" + normalize(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)) + "```\n"
    }
    val sections: Seq[(String, String)] = headline.flatMap { name =>
      val main = name -> section(name, graft.SparkEntry.queries(name)(spark, sfDir))
      // The audited sketch queries plan over a materialized checkpoint
      // of this subtree (the audit and the output share one
      // materialization) — dump the pipeline itself alongside so the
      // audit boundary doesn't hide it from the plan record.
      if (name == "dedup_minhash_lsh")
        Seq(main, "dedup_minhash_lsh (pre-audit pipeline)" ->
          section("dedup_minhash_lsh (pre-audit pipeline)",
            graft.dedup.Dedup.minhashPairs(spark, sfDir)))
      else Seq(main)
    }

    val text = only match {
      case Some(_) =>
        // Splice the regenerated sections into the existing artifact.
        var doc = Files.readString(Paths.get(out))
        sections.foreach { case (name, sec) =>
          val hdr = s"\n## $name\n"
          val start = doc.indexOf(hdr)
          if (start < 0) {
            // New operator: insert in sorted position (before the first
            // later-sorting section header, else at end of file).
            val insertAt = all.filter(_ > name)
              .map(n => doc.indexOf(s"\n## $n\n")).filter(_ >= 0)
              .minOption.getOrElse(doc.length)
            doc = doc.substring(0, insertAt) + sec + doc.substring(insertAt)
          } else {
            val next = doc.indexOf("\n## ", start + hdr.length)
            val end = if (next < 0) doc.length else next
            doc = doc.substring(0, start) + sec + doc.substring(end)
          }
        }
        doc
      case None =>
        val sb = new StringBuilder
        sb.append("# Physical plans (generated by graft.tools.ExplainDump)\n\n")
        sb.append(s"Source: `$sfDir`. Regenerate with " +
          "`sbt \"runMain graft.tools.ExplainDump\"` (whole file) or " +
          "`… ExplainDump <sfDir> docs/PLANS.md <query[,query…]>` " +
          "(just those sections — the one-operator workflow).\n" +
          "Expression/RDD/stage/codegen ids are normalized to " +
          "per-section `x`-sequences so diffs stay local to the " +
          "touched query.\n")
        sections.foreach { case (_, sec) => sb.append(sec) }
        sb.toString
    }
    Files.createDirectories(Paths.get(out).getParent)
    Files.writeString(Paths.get(out), text)
    println(s"[explain-dump] wrote $out" +
      only.map(n => s" (sections: ${n.mkString(",")})").getOrElse(""))
    spark.stop()
  }
}
