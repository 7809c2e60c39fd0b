package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.sources.Tables

/** Text-analysis operators for the training-data pipeline
  * (SURVEY.md §2.6) over the `documents` table.
  *
  * Everything here is narrow (per-row column arithmetic + regex, no
  * shuffle except final presentation ordering), so the plans are pure
  * map-side scans at any scale — the kind of operator you run over
  * 100 TB exactly once and want fully inside whole-stage codegen.
  */
object Text {

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single other
    * non-space chars — the standard byte-pair-encoding pre-split. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** #41 text_token_stats: char/token counts per document. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(tokens(col("text"))).as("n_ws_tokens"),
        size(regexp_extract_all(lower(col("text")), lit(BpePattern), lit(0))).as("n_bpe_tokens"),
        length(regexp_replace(lower(col("text")), "[^a-z]", "")).as("n_alpha_chars"))
      .orderBy(col("doc_id"))

  /** Stopword list used by the quality score (English function words). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "on", "for")

  /** #42 text_quality: length/punct/digit/stopword signals and a single
    * [0,1] quality score, rounded to fixed decimals so the result is
    * bit-stable for the oracle hash. */
  def quality(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = size(toks).cast("double")
    val nChars = length(col("text")).cast("double")
    val punct = length(regexp_replace(lower(col("text")), "[a-z0-9\\s]", "")).cast("double")
    val digits = length(regexp_replace(col("text"), "[^0-9]", "")).cast("double")
    val stops = size(filter(toks, t => t.isInCollection(Stopwords))).cast("double")
    // Round through an exact decimal so both engines agree on the 4-place
    // value, then present as double (the decimal→double conversion is the
    // same IEEE nearest on both sides; a decimal output column would
    // string-compare with trailing zeros the float64 oracle lacks).
    val d4 = (c: Column) => round(c, 4).cast("decimal(10,4)").cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        size(toks).as("n_tokens"),
        d4(punct / nChars).as("punct_ratio"),
        d4(digits / nChars).as("digit_ratio"),
        d4(stops / nToks).as("stopword_ratio"),
        // docs in [50, 2000] chars with some stopwords and little
        // punctuation score high — a typical pretrain quality gate.
        d4(least(nChars / 500.0, lit(1.0)) * 0.4
          + least(stops / greatest(nToks * 0.05, lit(1.0)), lit(1.0)) * 0.4
          + greatest(lit(1.0) - punct / greatest(nChars * 0.1, lit(1.0)), lit(0.0)) * 0.2
        ).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Per-language marker-word profiles for the n-gram/stopword language
    * ID heuristic. Tiny on purpose: the point is the plan shape (pure
    * codegen'd map over 100 TB), not linguistic accuracy. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "y", "no", "una", "por"))

  /** #43 text_langid: argmax of per-language marker-token density; CJK
    * character ratio short-circuits to zh. DuckDB-oracled (marker-list
    * filter + struct argmax); accuracy additionally asserted in the
    * spec on real multilingual fixtures, since the corpus `lang` column
    * is synthetic noise. */
  def langid(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nToks = greatest(size(toks), lit(1)).cast("double")
    val scores = LangProfiles.map { case (lang, marks) =>
      struct(
        (size(filter(toks, t => t.isInCollection(marks))).cast("double") / nToks).as("score"),
        lit(lang).as("lang"))
    }
    val cjkRatio = (length(col("text")) -
      length(regexp_replace(col("text"), "[\\x{4e00}-\\x{9fff}]", ""))).cast("double") /
      greatest(length(col("text")), lit(1)).cast("double")
    val best = greatest(scores: _*)
    val d4 = (c: Column) => round(c, 4).cast("decimal(10,4)").cast("double")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        when(cjkRatio > 0.3, lit("zh")).otherwise(best.getField("lang")).as("pred_lang"),
        d4(when(cjkRatio > 0.3, cjkRatio).otherwise(best.getField("score"))).as("pred_score"))
      .orderBy(col("doc_id"))
  }

  /** #44 text_fingerprint: winnowed Rabin-Karp fingerprints (k=8 chars,
    * window 4) + a compact 64-bit digest per doc. Shared substrings ≥ 11
    * chars guarantee shared fingerprint values — the substring-level
    * analog of shingle dedup. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Sketches.winnowFingerprint(lower(col("text")), 8, 4).as("fp"))
      .select(
        col("doc_id"),
        size(col("fp")).as("n_fingerprints"),
        // XOR-fold digest: engine-portable (unlike Spark's internal
        // hash()), order-independent, and overflow-free under ANSI.
        aggregate(col("fp"), lit(0L), (a, x) => a.bitwiseXOR(x)).as("fp_digest"),
        // serialized, not array-typed: query outputs must stay flat
        // (scalar columns only) for the driver's pandas sort
        concat_ws(",", slice(col("fp"), 1, 8).cast("array<string>")).as("fp_head"))
      .orderBy(col("doc_id"))
}
