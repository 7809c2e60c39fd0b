package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.sources.Tables

/** Training-data deduplication operators (SURVEY.md §2.4) over the
  * `documents` (and `embeddings`) tables.
  *
  * Scale shape: every near-dup variant is
  * sketch (narrow, codegen'd) → bucket key → ONE shuffle on the bucket
  * key → in-bucket pair generation (local, capped) → verify. No plan
  * here ever cross-joins the corpus; candidate generation is always an
  * equality-key aggregation, which is the only formulation that still
  * shuffles (instead of exploding) at 100 TB. Oversized buckets — the
  * skew risk of any LSH at scale — are capped: a bucket with more than
  * `maxBucket` members is dropped from pair generation (standard
  * practice; such buckets are degenerate shingles/planes, not dups).
  */
object Dedup {

  /** Tokenize to lowercase word array. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Distinct lowercase k-word shingles of the raw text (the near-dup
    * unit) — native single-pass expression; see
    * [[Sketches.wordShingles]] for why not the declarative HOF stack. */
  def shingles(text: Column, k: Int): Column = Sketches.wordShingles(text, k)

  /** Jaccard of two pre-distinct string arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** #34 dedup_exact: content-hash dedup, min-id survivor per group. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_md5"))
      .agg(
        min(col("doc_id")).as("survivor_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("survivor_doc_id"))

  /** In-bucket pair generation from a sorted member array: all (a, b)
    * with a < b, computed locally after the bucket aggregation — pairs
    * never cross the wire unverified. Native codegen'd expression; the
    * HOF-lambda formulation evaluated interpreted and was the dedup
    * suite's hotspot. */
  private def bucketPairs(ids: Column): Column = Sketches.sortedPairs(ids)

  /** Candidate pairs from a banded signature: group by (band, key),
    * cap bucket size, emit local pairs, dedup across bands. The cap is
    * enforced INSIDE the aggregation ([[graft.functions.CollectSetLimit]]):
    * an overflowing bucket costs O(maxBucket) buffer memory and yields
    * null, so a degenerate mega-bucket can never OOM a task. */
  private def candidatesFromBands(banded: DataFrame, maxBucket: Int): DataFrame =
    banded
      .groupBy(col("band"), col("band_key"))
      .agg(graft.functions.CollectSetLimit
        .collectSetLimit(col("doc_id"), maxBucket).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      .select(explode(bucketPairs(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()

  /** The exact df-capped ngram pair set (the in-engine ground truth
    * [[ngramJaccard]] already computes for the cluster step),
    * materialized ONCE per (session, dir) into a lineage-free local
    * checkpoint and memoized: minhash and simhash audit against the
    * SAME tiny materialized frame instead of each re-running the whole
    * exact pipeline. The checkpoint is duplication-bounded (the capped
    * pair list), so keeping it resident costs kilobytes, not corpus. */
  // Session-scoped with explicit application-end eviction (see
  // SessionScopedCache: the cached frames strongly reference their
  // session, so weak keying alone could never free an entry).
  private val exactPairCache = new graft.functions.SessionScopedCache("dedup.exact_pairs")
  private def exactPairSet(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardM(spark, dir).select(col("doc_a"), col("doc_b"))

  /** The FULL exact ngram pair frame (with jaccard), memoized per
    * (session, dir): the dedup_ngram_jaccard query, both sketch
    * audits, and the clusters/survivors pipeline all read ONE
    * materialized checkpoint — the inverted-index pipeline runs once
    * per session regardless of which consumer asks first. The frame is
    * duplication-bounded (the capped pair list), kilobytes resident. */
  private def ngramJaccardM(spark: SparkSession, dir: String): DataFrame =
    exactPairCache.getOrCompute(spark, dir) {
      ngramJaccardOf(shingledDocs(spark, dir)).localCheckpoint()
    }

  /** Append a constant self-audit column to an approximate pair list:
    * the fraction of the exact pair set ([[exactPairSet]] — shared
    * across both sketch audits) that the approximate list recovered —
    * the same pattern as the ANN recall@k columns, so a rows-only dump
    * carries its own checkable quality number. The approximate list is
    * materialized first (it is capped and tiny) so the recall aggregate
    * and the output both re-read it instead of re-running the sketch
    * pipeline; the recall itself is a 1-row global AGGREGATE broadcast
    * back onto the pairs — no single-task global window anywhere, so
    * the shape survives a corpus-proportional pair frame at 100 TB.
    *
    * `sampleMod`: optional sampled audit for scales where even one
    * shared exact-pair pass is a full corpus job — ground truth is
    * computed only over the deterministic 1-in-`mod` doc sample
    * (md5-bucket on doc_id) and recall over sampled-endpoint pairs,
    * cutting the audit's pair volume by ~mod² and its corpus pass by
    * ~mod. The emitted column keeps its name and meaning (recall vs
    * the in-sample exact pairs). */
  /** Memoized approximate pair lists, one entry per sketch family —
    * the same session-shared-artifact discipline as [[ngramJaccardM]]:
    * a pair list is the frame a pipeline's downstream stages (and
    * repeated calls) consume, and it is capped-tiny, so it
    * materializes once per (session, dir, family). */
  private val approxPairCache = new graft.functions.SessionScopedCache("dedup.approx")

  private def withPairRecall(approx: => DataFrame, memoKey: String,
      spark: SparkSession, dir: String,
      sampleMod: Option[Int] = None): DataFrame = {
    // Keyed WITHOUT sampleMod: the cached pair list is the same frame
    // for every audit mode (only the recall branch depends on the
    // sample), so one materialization serves them all.
    val approxM = approxPairCache.getOrCompute(
      spark, s"$dir#$memoKey")(approx.localCheckpoint())
    val inSample = (id: Column) => sampleMod.fold(lit(true))(m =>
      pmod(crc32(id.cast("string")), lit(m.toLong)) === 0L)
    val exact = sampleMod match {
      case None => exactPairSet(spark, dir)
      case Some(_) => ngramJaccardOf(
          shingledDocs(spark, dir).filter(inSample(col("doc_id"))))
        .select(col("doc_a"), col("doc_b"))
    }
    val recall = approxM
      .filter(inSample(col("doc_a")) && inSample(col("doc_b")))
      .select(col("doc_a"), col("doc_b")).withColumn("_a", lit(1))
      .join(exact.withColumn("_e", lit(1)), Seq("doc_a", "doc_b"), "full_outer")
      .agg((sum(when(col("_e") === 1 && col("_a") === 1, 1.0).otherwise(0.0)) /
        greatest(sum(when(col("_e") === 1, 1.0).otherwise(0.0)), lit(1.0)))
        .as("recall_vs_exact"))
    approxM.crossJoin(broadcast(recall))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** #35 dedup_minhash_lsh: 3-word shingles → 128-hash MinHash signature
    * → 32 bands × 4 rows → bucket join → exact-Jaccard verify ≥ 0.5.
    * Band probability at j=0.9 is ≈ 1, at j=0.02 (the corpus noise
    * floor) is ≈ 0 — candidates are a tiny fraction of n². */
  def minhashLsh(spark: SparkSession, dir: String,
      auditSampleMod: Option[Int] = None): DataFrame =
    withPairRecall(minhashPairs(spark, dir), "minhash", spark, dir, auditSampleMod)

  /** The verified minhash pair list BEFORE the recall audit — the
    * frame the audit materializes; exposed so plan tests can pin the
    * pipeline's shape (the audited query plans over the materialized
    * checkpoint, which hides this subtree). */
  private[graft] def minhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val numHashes = 128
    val bands = 32
    val rows = numHashes / bands
    val docs = shingledDocs(spark, dir)
    val sigs = docs.select(col("doc_id"), col("sh"),
      Sketches.minhashSigs(col("sh"), numHashes).as("sig"))

    val banded = sigs.select(
      col("doc_id"),
      posexplode(Sketches.bandHashes(col("sig"), bands)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))

    val cand = candidatesFromBands(banded, maxBucket = 200)
    val bySh = docs.select(col("doc_id"), col("sh"))
    cand
      .join(bySh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(bySh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
  }

  /** Deterministic increment membership for [[incremental]]: the
    * md5-ppm bucket convention (the sampleTemperature / sample_split
    * discipline — key-derived, so membership is stable under re-runs
    * and data relocation) on doc_id with salt `#inc`; buckets at or
    * above 900 000 (10% of the corpus) are "today's batch", the rest
    * the persisted corpus. */
  private[graft] def incBucket(docId: Column): Column =
    graft.sources.PersistedIndex.ppmBucket(docId, lit("#inc"))

  /** The PERSISTED corpus signature index behind [[incremental]] —
    * the [[lshCurve]] commentary's "at real scale the signature
    * matrix persists as an index table", made literal as TWO
    * bucketed+sorted parquet tables per (session, dir)
    * ([[graft.sources.Bucketing]], the 11d machinery):
    *
    *   - `sig` (doc_id, band, band_key), bucketed on band_key — the
    *     candidate side of the daily join; and
    *   - `sh` (doc_id, sh), bucketed on doc_id — the VERIFY-GRADE
    *     shingle store (VERDICT r14 #3): candidate verification joins
    *     THIS table for the corpus side's shingle sets, so a daily
    *     increment run touches increment + candidate + index data
    *     only and never re-scans or re-shingles corpus text; and
    *   - `stats` (band, band_key, n), bucketed on band_key — the
    *     bucket-cardinality SIDE TABLE, written at build and appended
    *     a delta per ingest (VERDICT r15 #4, closing the r15 code's
    *     own deferral): the read-time ≤200 cap aggregates THIS table
    *     (bucket-count-sized, pre-aggregated per append) instead of
    *     paying a full-postings pass every daily run.
    *
    * Design notes vs the r14 single-table form:
    *
    *   1. The degenerate-bucket cap (> 200 members) is evaluated at
    *      READ time (VERDICT r14 #4): once the index is appendable,
    *      an append that pushes a bucket across the cap would have to
    *      retroactively drop the bucket's OLD rows for fresh-build
    *      parity, which an append-only parquet layout can only
    *      express at read time. Since r16 the cap's cardinalities
    *      come from the stats side table (SUM(n) per bucket over the
    *      per-append deltas — exchange-free on the shared band_key
    *      bucketing), with the full-postings recompute kept as
    *      [[capOkFromPostings]] for the parity spec.
    *   2. Table names key on the full MD5 hex of the dir (+ a caller
    *      salt for spec-built variants), not dir.hashCode (ADVICE
    *      r14: two dirs with colliding hashCodes in one session would
    *      silently cross-serve each other's index).
    *
    * Memoized per (session, dir) like the BPE merge table (the value
    * is a plain table-name triple). */
  private[graft] final case class SigIndex(sig: String, sh: String, stats: String)

  private val sigIndexMemo =
    new graft.sources.PersistedIndex.SessionMemo[SigIndex]

  private[graft] def signatureIndex(spark: SparkSession, dir: String): SigIndex =
    sigIndexMemo.getOrCompute(spark, dir)(
      buildSignatureIndex(spark, dir, 900000L, ""))

  /** (doc_id, band, band_key) — 128-hash / 32-band signatures, the
    * banding both the index build and the increment side run. */
  private def bandedOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(Sketches.bandHashes(Sketches.minhashSigs(col("sh"), 128), 32)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))

  /** Build the index pair over docs with [[incBucket]] < `hiExcl`
    * (drop-and-recreate; a PREVIOUS JVM may have left the managed
    * tables' directories in the filesystem-persistent warehouse while
    * the in-memory catalog starts empty, so both sides are cleared
    * before the write). `salt` lets specs build day-0 variants beside
    * the session's canonical index. */
  private[graft] def buildSignatureIndex(spark: SparkSession, dir: String,
      hiExcl: Long, salt: String): SigIndex = {
    graft.functions.DriverMemo.recordBuild()
    val key = graft.sources.PersistedIndex.tableKey(dir, salt)
    val idx = SigIndex(s"graft_dedup_sig_idx_$key", s"graft_dedup_sh_idx_$key",
      s"graft_dedup_sigstats_idx_$key")
    Seq(idx.sig, idx.sh, idx.stats).foreach(
      graft.sources.PersistedIndex.dropAndClean(spark, _))
    val corpus = shingledDocs(spark, dir)
      .filter(incBucket(col("doc_id")) < hiExcl)
    val banded = bandedOf(corpus)
    graft.sources.Bucketing.writeBucketed(
      banded, idx.sig, "band_key", nBuckets = 8)
    graft.sources.Bucketing.writeBucketed(
      corpus.select(col("doc_id"), col("sh")), idx.sh, "doc_id", nBuckets = 8)
    graft.sources.Bucketing.writeBucketed(
      statsDeltaOf(banded), idx.stats, "band_key", nBuckets = 8)
    idx
  }

  /** One ingest's bucket-cardinality delta — (band, band_key, n) over
    * a banded frame. The stats table is the per-append UNION of these
    * (reads SUM the deltas), so an append writes a batch-sized delta
    * and never touches existing stats rows. */
  private def statsDeltaOf(banded: DataFrame): DataFrame =
    banded.groupBy(col("band"), col("band_key")).agg(count(lit(1)).as("n"))

  /** Ingest a verified batch into the index (VERDICT r14 #4 — the
    * text analog of Kv.migrate -W's high-water advance): append the
    * batch's band signatures, its verify-grade shingle sets, and its
    * bucket-cardinality stats delta to the SAME bucketed layouts,
    * inside [[graft.sources.PersistedIndex.appendExactlyOnce]]'s
    * bracket (overlap-checked before, high-water recorded only after
    * all three appends land — ADVICE r15). The shuffle is
    * batch-sized; existing index files are untouched. Day-2
    * candidates against (corpus + day-1) then equal a fresh full
    * build — the two-day parity spec. */
  private[graft] def appendIncrement(spark: SparkSession, dir: String,
      idx: SigIndex, loIncl: Long, hiExcl: Long): Unit =
    graft.sources.PersistedIndex.appendExactlyOnce(
      spark, idx.sig, loIncl, hiExcl) {
      // Three independent write actions share one ingest batch — the
      // shingle pass and the banding each run ONCE via batch-sized
      // localCheckpoints (r16 review: uncached lineage re-shingled
      // and re-minhashed the increment text per append).
      val inc = shingledDocs(spark, dir)
        .filter(incBucket(col("doc_id")) >= loIncl &&
          incBucket(col("doc_id")) < hiExcl)
        .localCheckpoint()
      val banded = bandedOf(inc).localCheckpoint()
      graft.sources.Bucketing.appendBucketed(
        banded, idx.sig, "band_key", nBuckets = 8)
      graft.sources.Bucketing.appendBucketed(
        inc.select(col("doc_id"), col("sh")), idx.sh, "doc_id", nBuckets = 8)
      graft.sources.Bucketing.appendBucketed(
        statsDeltaOf(banded), idx.stats, "band_key", nBuckets = 8)
    }

  /** The (band, band_key) buckets at or under the read-time cap,
    * from the STATS side table: SUM the per-append deltas per bucket —
    * an exchange-free aggregate over the stats table's band_key
    * bucketing, sized by the bucket count, not the postings (VERDICT
    * r15 #4: the daily run no longer pays a full-postings pass for
    * the cap). */
  private[graft] def capOkBuckets(
      spark: SparkSession, idx: SigIndex, maxBucket: Int = 200): DataFrame =
    spark.table(idx.stats)
      .groupBy(col("band"), col("band_key"))
      .agg(sum(col("n")).as("n")).filter(col("n") <= maxBucket)
      .select(col("band"), col("band_key"))

  /** The same cap set recomputed from the POSTINGS (the pre-r16
    * read-time form) — kept as the parity spec's independent truth:
    * stats-derived and postings-derived cap sets must be identical
    * after any build/append history, or the stats table has drifted. */
  private[graft] def capOkFromPostings(
      spark: SparkSession, idx: SigIndex, maxBucket: Int = 200): DataFrame =
    spark.table(idx.sig)
      .groupBy(col("band"), col("band_key"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= maxBucket)
      .select(col("band"), col("band_key"))

  /** Candidate (new_id, corpus_id) pairs of an increment against the
    * index, under the read-time ≤ 200 bucket cap: the cap aggregate
    * (over the stats side table) and its semi-join both ride the
    * index's bucketed partitioning (NO exchange on any index
    * subtree); only the increment side shuffles to meet it — and at
    * gated scale AQE broadcasts the increment instead, dropping even
    * that. */
  private def indexCandidates(
      spark: SparkSession, idx: SigIndex, incBanded: DataFrame): DataFrame = {
    val index = spark.table(idx.sig)
    val ok = capOkBuckets(spark, idx)
    incBanded
      .join(index.join(ok, Seq("band", "band_key"), "left_semi"),
        Seq("band", "band_key"))
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .distinct()
  }

  /** Verified candidate pairs of an increment frame against an index:
    * bucket join → exact shingle Jaccard, with the corpus side's
    * shingle sets read from the PERSISTED store (idx.sh, bucketed on
    * doc_id — no corpus text scan, no re-shingle; VERDICT r14 #3) and
    * the increment side's from the increment frame itself. */
  private def verifiedPairsOver(
      spark: SparkSession, idx: SigIndex, inc: DataFrame): DataFrame = {
    val incBanded = bandedOf(inc).withColumnRenamed("doc_id", "new_id")
    indexCandidates(spark, idx, incBanded)
      .join(inc.select(col("doc_id").as("new_id"), col("sh").as("sh_n")),
        Seq("new_id"))
      .join(spark.table(idx.sh)
        .select(col("doc_id").as("corpus_id"), col("sh").as("sh_c")),
        Seq("corpus_id"))
      .select(col("new_id"), col("corpus_id"),
        jaccard(col("sh_n"), col("sh_c")).as("jaccard"))
  }

  /** #35b dedup_incremental: near-dup check of a NEW batch against the
    * PERSISTED signature index — the operational form every
    * 100 TB dedup actually runs (nobody re-minhashes the corpus for a
    * daily increment; the text analog of Kv.migrate -W). The corpus
    * index is [[signatureIndex]]'s bucketed table pair (shuffle paid
    * once at ingest); the increment's banded signatures join it on
    * the band-bucket key — the INDEX side reads with NO exchange (the
    * bucketed layout IS its partitioning), only the daily-increment
    * side shuffles, and at gated scale AQE is free to broadcast the
    * increment instead, which drops even that. Candidates are
    * verified by exact shingle Jaccard — the corpus side's shingle
    * sets from the index's persisted store, the increment side's from
    * the day's batch, so the verify stage never re-scans corpus text.
    * The report is one row per increment doc (the form the ingest
    * decision consumes, and non-empty at every scale): bucket-stage
    * candidate count, best corpus match under the house
    * (score DESC, id ASC) tie rule, and the ≥ 0.5 is_dup verdict.
    *
    * Parity contract (spec'd at sf0.001 under the bucket-cap
    * precondition): the verified inc-vs-corpus pairs here are EXACTLY
    * the [[minhashPairs]] full-run pairs with one endpoint in the
    * increment — the decomposition loses nothing while touching only
    * increment-sized data per day. A second spec closes the ingest
    * loop: [[appendIncrement]]'s day-1 append followed by a day-2 run
    * equals a fresh full build. */
  def incremental(spark: SparkSession, dir: String): DataFrame =
    incrementalReport(spark, dir, signatureIndex(spark, dir), 900000L)

  /** [[incremental]] against an explicit index + increment floor —
    * the form the two-day parity spec drives with a day-0 index. */
  private[graft] def incrementalReport(spark: SparkSession, dir: String,
      idx: SigIndex, incLo: Long): DataFrame = {
    val inc = shingledDocs(spark, dir)
      .filter(incBucket(col("doc_id")) >= incLo)
    val best = verifiedPairsOver(spark, idx, inc)
      .groupBy(col("new_id"))
      .agg(count(lit(1)).as("n_candidates"),
        graft.functions.TopKByScore
          .topkByScore(col("jaccard"), col("corpus_id"), 1).as("top"))
      .select(col("new_id"), col("n_candidates"),
        element_at(col("top"), 1).getField("id").as("best_match"),
        element_at(col("top"), 1).getField("score").as("best_jaccard"))
    inc.select(col("doc_id"))
      .join(best, col("doc_id") === col("new_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_match"), col("best_jaccard"),
        coalesce(col("best_jaccard") >= 0.5, lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** #35c dedup_index_audit: the SATURATION report of the persisted
    * signature index (VERDICT r15 #3) — the number
    * the read-time ≤200 bucket cap silently spends as an appended
    * index ages: a bucket that crosses the cap is dropped WHOLESALE at
    * candidate time (fresh-build parity holds — a fresh build drops
    * the same buckets — but recall decays), and until this report the
    * operator never learned how much of the index the cap was eating.
    * One row: bucket count, capped-bucket count, total postings,
    * postings masked by the cap, the masked SHARE (the scheduled-
    * rebuild trigger: rising share = banding no longer separating this
    * corpus — rebuild with more bands or a larger cap), and the
    * largest bucket. Computed entirely from the stats side table —
    * bucket-count-sized input, one exchange-free aggregate over its
    * band_key bucketing, no postings scan. Under the full hash gate:
    * the oracle replays the banding over the corpus slice and derives
    * the same six numbers from the naive bucket group-by. */
  def indexAudit(spark: SparkSession, dir: String): DataFrame =
    indexAuditOver(spark, signatureIndex(spark, dir))

  /** [[indexAudit]] against an explicit index — the planted-saturation
    * spec's form. */
  private[graft] def indexAuditOver(
      spark: SparkSession, idx: SigIndex, maxBucket: Int = 200): DataFrame = {
    import graft.functions.Exact.ratio4
    spark.table(idx.stats)
      .groupBy(col("band"), col("band_key"))
      .agg(sum(col("n")).as("n"))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(when(col("n") > maxBucket, 1L).otherwise(0L)).as("n_capped_buckets"),
        sum(col("n")).as("n_postings"),
        sum(when(col("n") > maxBucket, col("n")).otherwise(0L))
          .as("n_postings_masked"),
        max(col("n")).as("max_bucket"))
      .select(col("n_buckets"), col("n_capped_buckets"), col("n_postings"),
        col("n_postings_masked"),
        ratio4(col("n_postings_masked"), greatest(col("n_postings"), lit(1L)))
          .as("masked_share"),
        col("max_bucket"))
  }

  /** The verified inc-vs-corpus pair list (new_id, corpus_id, jaccard
    * ≥ 0.5) behind [[incremental]] — exposed for the parity spec
    * (increment ∪ corpus ≡ full run). */
  private[graft] def incrementalPairs(spark: SparkSession, dir: String): DataFrame =
    incrementalPairsOver(spark, dir, signatureIndex(spark, dir), 900000L)

  /** [[incrementalPairs]] against an explicit index + increment floor
    * (the two-day parity spec's day-2 form). */
  private[graft] def incrementalPairsOver(spark: SparkSession, dir: String,
      idx: SigIndex, incLo: Long): DataFrame =
    verifiedPairsOver(spark, idx,
      shingledDocs(spark, dir).filter(incBucket(col("doc_id")) >= incLo))
      .filter(col("jaccard") >= 0.5)

  /** #37f dedup_lsh_curve: the MinHash-LSH banding trade-off curve —
    * candidate volume, recall and precision of the bucket-collision
    * stage against the exact df-capped Jaccard pair set, for band
    * counts 8/16/32 over ONE shared 128-hash signature (rows per band
    * 16/8/4). This is the dedup family's tuning report: band count is
    * THE scale knob (the S-curve threshold sits near (1/b)^(1/r)), and
    * a banding rollout is chosen from exactly this curve. One
    * signature pass (localCheckpoint'd inside the call so the three
    * bandings share it — the signature matrix is corpus-sized, so it
    * is NOT session-memoized; at real scale it persists as an index
    * table, which this materialization stands in for); each banding is
    * the pipeline's own capped-bucket candidate stage; truth is the
    * memoized [[exactPairSet]]. Counts are integers and the ratios are
    * [[graft.functions.Exact.ratio4]], so the curve sits under the
    * hash gate next to the ann_tuning_curve. */
  def lshCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact.ratio4
    val numHashes = 128
    val bandCounts = Seq(8, 16, 32)
    val sigs = shingledDocs(spark, dir)
      .select(col("doc_id"), Sketches.minhashSigs(col("sh"), numHashes).as("sig"))
      .localCheckpoint()
    val truth = exactPairSet(spark, dir)
    val truthCount = truth.agg(count(lit(1)).as("n_true_pairs"))
    val rows = bandCounts.map { b =>
      val banded = sigs.select(col("doc_id"),
        posexplode(Sketches.bandHashes(col("sig"), b)))
        .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
      val cand = candidatesFromBands(banded, maxBucket = 200)
      // ONE evaluation of the bucket-pair pipeline per banding: the
      // candidate count and the truth-hit count ride the same LEFT
      // join aggregate (truth pairs are unique, so the join cannot
      // duplicate a candidate), where the previous two-aggregate
      // crossJoin shape evaluated `cand` twice per banding.
      cand.join(truth.withColumn("_t", lit(1)), Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_candidates"),
          count(col("_t")).as("n_found"))
        .select(lit(b).as("n_bands"),
          lit(numHashes / b).as("rows_per_band"),
          col("n_candidates"), col("n_found"))
    }.reduce(_ union _)
    rows.crossJoin(broadcast(truthCount))
      .select(col("n_bands"), col("rows_per_band"),
        col("n_candidates"), col("n_true_pairs"), col("n_found"),
        ratio4(col("n_found"), greatest(col("n_true_pairs"), lit(1L)))
          .as("recall"),
        ratio4(col("n_found"), greatest(col("n_candidates"), lit(1L)))
          .as("precision"))
      .orderBy(col("n_bands"))
  }

  /** #37i dedup_threshold_curve: the VERIFY-threshold keep-rate curve —
    * for each candidate Jaccard cutoff (0.5 / 0.6 / 0.7 / 0.8), how
    * many pairs survive, how many distinct docs are implicated, and
    * what share of the corpus that is — the decision surface a dedup
    * rollout picks its threshold from, completing the tuning-report
    * family (quality_curve sweeps the quality gate, lsh_curve the
    * banding, ann_tuning_curve the probe count; this sweeps the one
    * constant dedup still hard-codes). 0.5 is the family's pinned
    * candidate floor, so every level is a filter over ONE shared frame.
    *
    * Scale shape: all four levels are filters over the SAME memoized
    * duplication-bounded exact pair frame ([[ngramJaccardM]] — built
    * once per session, kilobytes resident); each level is a
    * dimension-sized aggregate plus a distinct over the pair
    * endpoints, never a corpus pass. The corpus-size denominator is a
    * 1-row broadcast. */
  def thresholdCurve(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.Exact.ratio4
    val pairs = ngramJaccardM(spark, dir)
    val nDocs = Tables.documents(spark, dir)
      .agg(count(lit(1)).as("n_docs_corpus"))
    val levels = Seq(0.5, 0.6, 0.7, 0.8)
    val rows = levels.map { t =>
      // ONE pass per level (the lshCurve single-aggregate discipline):
      // both counts ride the exploded-endpoint frame — a pair emits
      // exactly 2 endpoint rows, so n_pairs is the integer half.
      pairs.filter(col("jaccard") >= t)
        .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
        .agg(expr("count(1) div 2").as("n_pairs"),
          countDistinct(col("d")).as("n_docs_in_pairs"))
        .select(lit(t).as("threshold"), col("n_pairs"), col("n_docs_in_pairs"))
    }.reduce(_ union _)
    rows.crossJoin(broadcast(nDocs))
      .select(col("threshold"), col("n_pairs"), col("n_docs_in_pairs"),
        col("n_docs_corpus"),
        ratio4(col("n_docs_in_pairs"), greatest(col("n_docs_corpus"), lit(1L)))
          .as("doc_share"))
      .orderBy(col("threshold"))
  }

  /** #36 dedup_simhash: 64-bit SimHash over 3-word shingles; candidates
    * share one of 8 8-bit bands (pigeonhole: any pair with Hamming ≤ 7
    * is guaranteed a clean band), verified at Hamming ≤ 7. */
  def simhash(spark: SparkSession, dir: String,
      auditSampleMod: Option[Int] = None): DataFrame =
    withPairRecall(simhashPairs(spark, dir), "simhash", spark, dir, auditSampleMod)

  /** The verified simhash pair list before the recall audit — see
    * [[minhashPairs]]. */
  private[graft] def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingledDocs(spark, dir)
    val sigs = docs.select(col("doc_id"), Sketches.simhash64(col("sh")).as("sig"))

    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until 8).map(b =>
        shiftrightunsigned(col("sig"), b * 8).bitwiseAND(lit(0xffL))): _*)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))

    val cand = candidatesFromBands(banded, maxBucket = 200)
    val byId = sigs.select(col("doc_id"), col("sig"))
    cand
      .join(byId.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(byId.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        Sketches.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= 7)
  }

  /** #37 dedup_ngram_jaccard: EXACT pairwise Jaccard ≥ 0.5 over the
    * universe of discriminative shingles (document frequency ≤ 200) via
    * an inverted index — intersection counts come from a groupBy on the
    * shingle (one shuffle), never a doc×doc join. The df cap is the
    * prefix-filter analog (a shingle shared by hundreds of docs has no
    * discriminating power and would quadratically blow up the pair
    * count); numerator AND denominator are computed over the SAME
    * capped universe, so emitted Jaccard values are exact within it
    * rather than silently undercounted. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame =
    // Re-sorted after the checkpoint: materialization does not promise
    // to preserve the pipeline's output order.
    ngramJaccardM(spark, dir).orderBy(col("doc_a"), col("doc_b"))

  /** #37m dedup_containment: ASYMMETRIC set-containment pairs
    * (Broder 1997's second resemblance measure) — |A∩B|/|A| over the
    * smaller document's retained shingles, the subset-duplicate
    * detector symmetric Jaccard structurally under-scores (a short
    * doc fully embedded in a long one has containment 1.0 but
    * Jaccard ≈ |A|/|B| — arbitrarily far below any symmetric
    * threshold; the aggregation/quotation/boilerplate-expansion
    * class, [[substringPairs]]'s set-similarity sibling). Shares the
    * [[coAndSizes]] inverted-index kernel with the Jaccard pipeline
    * verbatim — same shingle rule, same df cap, same candidate set —
    * so the two reports can never disagree about what a pair's
    * overlap IS, only rank it differently. Pairs orient small→big by
    * retained-shingle count (ties by id); both scores present as
    * integer-count [[graft.functions.Exact.ratio4]], and the 0.8
    * gate compares the ROUNDED score (the quality-gate convention),
    * so the cut bites identically in the oracle.
    *
    * Scale shape: identical to the Jaccard pipeline — candidates are
    * the capped equality joins on shingle keys (never all-pairs),
    * and the size join is the same pinned big-big sort-merge. */
  def containment(spark: SparkSession, dir: String): DataFrame =
    // Session-memoized like the Jaccard pair frame (duplication-
    // bounded, kilobytes resident): the inverted-index pipeline runs
    // once per session, and the bench's first-attempt spike
    // attributes as memo-build.
    approxPairCache.getOrCompute(spark, s"$dir#containment")(
      containmentUncached(spark, dir).localCheckpoint())
      .orderBy(col("doc_small"), col("doc_big"))

  private def containmentUncached(spark: SparkSession, dir: String): DataFrame = {
    val (coCounts, sizes) = coAndSizes(shingledDocs(spark, dir))
    val aSmall = col("n_a") < col("n_b") ||
      (col("n_a") === col("n_b") && col("doc_a") < col("doc_b"))
    coCounts
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
        .hint("merge"), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
        .hint("merge"), "doc_b")
      .select(
        when(aSmall, col("doc_a")).otherwise(col("doc_b")).as("doc_small"),
        when(aSmall, col("doc_b")).otherwise(col("doc_a")).as("doc_big"),
        when(aSmall, col("n_a")).otherwise(col("n_b")).as("n_small_sh"),
        when(aSmall, col("n_b")).otherwise(col("n_a")).as("n_big_sh"),
        col("n_common"))
      .withColumn("containment",
        graft.functions.Exact.ratio4(col("n_common"), col("n_small_sh")))
      .withColumn("jaccard", graft.functions.Exact.ratio4(col("n_common"),
        col("n_small_sh") + col("n_big_sh") - col("n_common")))
      .filter(col("containment") >= 0.8)
  }

  /** Largest LSH bucket produced by one banding over the corpus — the
    * cap-audit seam for [[lshCurve]]'s spec. The curve's monotonicity
    * in band count is only GUARANTEED while no bucket crosses the
    * candidate stage's maxBucket cap: a capped bucket is dropped
    * wholesale (null from CollectSetLimit), and since fewer rows per
    * band make buckets coarser, a higher band count can legally LOSE
    * the dropped bucket's candidates on a denser corpus (ADVICE r12).
    * The spec asserts this profile stays well under the cap before
    * asserting monotonicity, so a fixture change fails with a named
    * precondition instead of a mysterious ordering violation. */
  private[graft] def maxBandBucket(
      spark: SparkSession, dir: String, bands: Int): Long =
    shingledDocs(spark, dir)
      .select(col("doc_id"),
        posexplode(Sketches.bandHashes(
          Sketches.minhashSigs(col("sh"), 128), bands)))
      .groupBy(col("pos"), col("col")).agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L))).head().getLong(0)

  /** The corpus as (doc_id, 3-word shingle set) — the shared input of
    * the exact pipeline and its sampled-audit variant. */
  private def shingledDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text"), 3).as("sh"))

  /** The inverted-index kernel shared by the Jaccard and containment
    * pipelines: per-shingle capped posting lists, per-doc
    * retained-shingle counts, and the co-occurrence pair counts —
    * ONE definition so the two similarity semantics can never see
    * different candidate sets. */
  private def coAndSizes(docs: DataFrame): (DataFrame, DataFrame) = {
    // One inverted index serves both sides: per-shingle posting lists
    // (null once df exceeds the cap — bounded buffer), from which both
    // the pair counts and the per-doc retained-shingle counts derive.
    val postings0 = docs
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .groupBy(col("shingle"))
      .agg(graft.functions.CollectSetLimit
        .collectSetLimit(col("doc_id"), 200).as("ids"))
      .filter(col("ids").isNotNull)

    val sizes = postings0
      .select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))

    val postings = postings0.filter(size(col("ids")) >= 2)

    val coCounts = postings
      .select(explode(bucketPairs(col("ids"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    (coCounts, sizes)
  }

  private[graft] def ngramJaccardOf(docs: DataFrame): DataFrame = {
    val (coCounts, sizes) = coAndSizes(docs)

    // SORT-MERGE, pinned: BOTH sides of this join grow with the corpus
    // — sizes is one row per doc, and the co-pair frame is Σ df·(df−1)/2
    // over the capped shingles, which scales QUADRATICALLY in df until
    // the cap bites (measured: 1.5M rows at sf0.1 → 125M at sf1 on a
    // saturated shingle space). Leaving the choice to stats/AQE planned
    // a broadcast of the pair side from a pre-explode underestimate and
    // OOM'd the 10× run (the r7 sf1 finding); a broadcast of sizes
    // instead would hit the wall at corpus cardinality. Big-big ⇒ SMJ
    // is the only strategy that holds at every scale.
    coCounts
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a"))
        .hint("merge"), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b"))
        .hint("merge"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** #37e dedup_substring: SUBSTRING-level duplicate pairs — the
    * overlap regime document-level shingle Jaccard misses (a long
    * quotation or boilerplate block inside two otherwise-unrelated
    * docs). Docs pair when they share ≥ `minShared` winnowed Rabin-Karp
    * fingerprints (k=8 chars, window 4 — the same kernel
    * `text_fingerprint` oracles): winnowing guarantees any shared
    * substring of ≥ k+w-1 = 11 chars contributes a common fingerprint,
    * so shared spans surface even at near-zero whole-doc Jaccard.
    * Same inverted-index shape as [[ngramJaccard]] — df-capped postings
    * on the fingerprint value (a fingerprint in hundreds of docs is
    * boilerplate hash residue, not duplication evidence), in-posting
    * sorted pairs, ONE shuffle, never O(n²). Emits the shared count and
    * a containment score (shared / smaller side's fingerprint count):
    * a small doc fully embedded in a large one scores 1.0 where Jaccard
    * would vanish. Pairs emit at containment ≥ 0.5 (the ngram
    * threshold convention): random 8-char window collisions put a
    * NOISE floor well below it (this corpus: ≤ ~0.45) while true
    * substring duplication scores ≥ 0.6 — the cut keeps the output
    * duplication-bounded instead of corpus-quadratic. */
  def substringPairs(spark: SparkSession, dir: String): DataFrame =
    // Same memoized-pair-list discipline as [[ngramJaccardM]]; the
    // pipeline's shape is pinned on [[substringPairsRaw]] (the
    // checkpoint hides the subtree from the audited plan).
    approxPairCache.getOrCompute(spark, s"$dir#substring")(
        substringPairsRaw(spark, dir).localCheckpoint())
      .orderBy(col("doc_a"), col("doc_b"))

  private[graft] def substringPairsRaw(spark: SparkSession, dir: String): DataFrame = {
    val minShared = 3
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        Sketches.winnowFingerprint(lower(col("text")), 8, 4).as("fp"))

    val postings0 = docs
      .select(col("doc_id"), explode(col("fp")).as("fpv"))
      .groupBy(col("fpv"))
      .agg(graft.functions.CollectSetLimit
        .collectSetLimit(col("doc_id"), 200).as("ids"))
      .filter(col("ids").isNotNull)

    val sizes = postings0
      .select(explode(col("ids")).as("doc_id"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"))

    val coCounts = postings0.filter(size(col("ids")) >= 2)
      .select(explode(bucketPairs(col("ids"))).as("p"))
      .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))

    // Unhinted size joins — see ngramJaccard: the size frame is
    // corpus-cardinality, the pair frame is capped; AQE broadcasts
    // whichever side fits.
    coCounts
      .filter(col("n_shared") >= minShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_fp").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_fp").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        graft.functions.Exact.ratio4(col("n_shared"),
          least(col("n_a"), col("n_b"))).as("containment"))
      // Cut on the ROUNDED value so the threshold bites identically in
      // the DuckDB oracle (both engines compare the same d4 double).
      .filter(col("containment") >= 0.5)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** #37b dedup_clusters: connected components over the near-dup pair
    * graph — the step a dedup pipeline needs AFTER pair generation
    * (pairs → transitive closure → cluster id → survivor pick).
    * Iterative min-label propagation: each round joins current labels
    * onto the edge list and keeps the minimum neighbor label;
    * converges in component-diameter rounds (near-dup clusters are
    * tiny, so the driver-side loop is O(1) rounds of fully distributed
    * joins — the standard large-graph CC shape; at trillion-edge scale
    * you'd switch to large-star/small-star, same skeleton). Emits
    * (doc_id, cluster_id = min doc in component, cluster_size) for
    * every clustered doc. */
  def clusters(spark: SparkSession, dir: String): DataFrame =
    // The clustered-doc assignment is itself a shared pipeline artifact
    // (survivors and the curation funnel re-derive from it, and its
    // result is already a lineage-free localCheckpoint), so it
    // memoizes per (session, dir) like the pair set it consumes: the
    // iterative CC loop runs once per session, not once per consumer.
    approxPairCache.getOrCompute(spark, s"$dir#clusters")(
      clustersUncached(spark, dir))

  private def clustersUncached(spark: SparkSession, dir: String): DataFrame = {
    // The pair frame is the SAME exact ngram pair set the sketch
    // audits consume — [[exactPairSet]]'s per-(session, dir) memoized
    // checkpoint — so across a session the ngram pipeline runs once,
    // not once per consumer (clusters / clusters_star / survivors /
    // both audits); the union below then re-reads the materialized
    // frame per branch instead of re-running the pipeline. The pair
    // graph is orders of magnitude smaller than the corpus (bounded by
    // the capped candidate generation), so it rides a FRACTION of the
    // session's shuffle parallelism — derived from the conf, so a
    // cluster-sized session scales the loop without a code change.
    val pairs = exactPairSet(spark, dir)
    val edgeParts = math.max(2, spark.conf.get("spark.sql.shuffle.partitions").toInt / 8)
    val edges = pairs
      .unionAll(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
      .repartition(edgeParts)
      .persist()
    var cached = edges.select(col("doc_a").as("v")).distinct()
      .withColumn("label", col("v"))
      .persist()
    var labels = cached
    try {
      var changed = 1L
      var iter = 0
      val maxIters = 25
      while (changed > 0 && iter < maxIters) {
        val nbrMin = edges
          .join(labels.select(col("v").as("doc_b"), col("label")), "doc_b")
          .groupBy(col("doc_a").as("v"))
          .agg(min(col("label")).as("nbr_min"))
        // Single join carries old + new label so the convergence count
        // rides the same materialization instead of a second join.
        val joined0 = labels
          .join(nbrMin, Seq("v"), "left_outer")
          .select(col("v"), col("label").as("_old"),
            least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        // Every 5th round, truncate lineage with an eager local
        // checkpoint (plan depth otherwise grows per iteration and
        // analysis cost with it); other rounds just cache.
        val joined =
          if (iter % 5 == 4) joined0.localCheckpoint() else joined0.persist()
        changed = joined.filter(col("label") =!= col("_old")).count()
        cached.unpersist()
        cached = joined
        labels = joined.select(col("v"), col("label"))
        iter += 1
      }
      // An unconverged exit would silently return WRONG cluster ids —
      // fail loudly instead (a graph whose diameter beats the cap needs
      // the large-star/small-star variant, not more iterations).
      require(changed == 0,
        s"cluster label propagation did not converge in $maxIters iterations " +
          s"($changed labels still changing)")
      val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      val result = labels.join(sizes, "label")
        .select(col("v").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
      // Materialize the (tiny) result once into a lineage-free local
      // checkpoint so EVERY loop cache can be released before
      // returning — consumers re-read the checkpoint, not the loop's
      // cached frames. Without this the final iteration's cache had to
      // stay resident for the caller, stranding one frame per call.
      result.localCheckpoint()
    } finally { cached.unpersist(); edges.unpersist() }
  }

  /** One large-star round (Kiveris et al., "Connected Components in
    * MapReduce and Beyond", Alg. 2): every node u links each LARGER
    * neighbor to the minimum of its closed neighborhood. The per-node
    * minimum rides a WINDOW over the symmetric view — one shuffle,
    * where the groupBy-then-join-back form costs two more; duplicates
    * are left for the following small-star's distinct. */
  private def largeStarRound(edges: DataFrame): DataFrame = {
    val sym = edges.unionAll(edges.select(col("b").as("a"), col("a").as("b")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
    sym
      .withColumn("_m", least(col("a"), min(col("b")).over(w)))
      .filter(col("b") > col("a") && col("b") =!= col("_m"))
      .select(col("b").as("a"), col("_m").as("b"))
  }

  /** One small-star round (ibid., Alg. 3): every node links its
    * SMALLER neighbors (and itself) to their minimum — the same
    * single-shuffle window shape, emitting both halves from one pass. */
  private def smallStarRound(edges: DataFrame): DataFrame = {
    val directed = edges.select(
      greatest(col("a"), col("b")).as("a"), least(col("a"), col("b")).as("b"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
    directed
      .withColumn("_m", min(col("b")).over(w))
      .select(explode(array(
        struct(col("b").as("a"), col("_m").as("b")),
        struct(col("a").as("a"), col("_m").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Edge count at or below which [[ccStar]] solves the component
    * problem on the driver instead of looping distributed rounds. The
    * r7 profile: each star round costs 3 shuffles + a signature action
    * + persist churn — ~10 s of fixed driver-round overhead on a
    * 1-2k-edge graph where the answer is microseconds of union-find.
    * 200k edges collect to ~3 MB (two longs each) — dimension-sized by
    * the cap itself, the same bounded-collect convention as the k×d
    * moment frames; anything larger takes the distributed rounds whose
    * O(log² n) convergence is the 100 TB story. */
  private[graft] val CcSmallGraphEdgeCap = 200000L

  /** Exact min-label connected components on the driver for graphs
    * under the cap: union-find with min-id roots — the union always
    * keeps the smaller root, so a component's root IS its min id,
    * matching the distributed contract bit-for-bit. */
  private def ccLocal(spark: SparkSession, pairs: DataFrame, edges: DataFrame): DataFrame = {
    import spark.implicits._
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs
      .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
      .distinct().collect().map(_.getLong(0))
    val parent = new java.util.HashMap[Long, java.lang.Long]()
    nodes.foreach(v => parent.put(v, v))
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    es.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    val label = nodes.map(v => v -> find(v)).toMap
    val sizes = label.values.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    nodes.sorted.toSeq.map(v => (v, label(v), sizes(label(v))))
      .toDF("doc_id", "cluster_id", "cluster_size")
  }

  /** Connected components by alternating large-star/small-star rounds
    * over a (doc_a, doc_b) pair frame — O(log² n) rounds regardless of
    * component DIAMETER (min-label propagation needs diameter-many
    * rounds, its one structural limit). Convergence is edge-set
    * stability, checked with a (count, hash-sum) signature so each
    * round costs one tiny action. Same output contract and cache
    * hygiene as [[clusters]]. Graphs at or under `smallGraphEdgeCap`
    * edges short-circuit to [[ccLocal]] (identical output) — the round
    * loop's fixed overhead dwarfs the work there, and the cap bounds
    * the collect by construction. */
  private[graft] def ccStar(
      spark: SparkSession, pairs: DataFrame,
      smallGraphEdgeCap: Long = CcSmallGraphEdgeCap): DataFrame = {
    val edgeParts = math.max(2, spark.conf.get("spark.sql.shuffle.partitions").toInt / 8)
    var cached = pairs
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .repartition(edgeParts).persist()
    try {
      if (cached.count() <= smallGraphEdgeCap)
        return ccLocal(spark, pairs, cached)
      var prevSig: Option[(Long, String)] = None
      var converged = false
      var round = 0
      val maxRounds = 30
      while (!converged && round < maxRounds) {
        val next0 = smallStarRound(largeStarRound(cached))
        val next = if (round % 3 == 2) next0.localCheckpoint() else next0.persist()
        // Decimal sum: a long sum of 64-bit hashes overflows under
        // ANSI arithmetic.
        val s = next
          .agg(count(lit(1)).as("n"),
            sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")).as("h"))
          .collect()(0)
        val sig = (s.getLong(0), String.valueOf(s.get(1)))
        converged = prevSig.contains(sig)
        prevSig = Some(sig)
        cached.unpersist()
        cached = next
        round += 1
      }
      require(converged,
        s"large-star/small-star did not stabilize in $maxRounds rounds")
      // The stable state is a star per component: every non-minimum
      // node carries one edge to its component minimum; minima appear
      // only on the b side and label themselves.
      val labels = cached.groupBy(col("a").as("v")).agg(min(col("b")).as("label"))
      val nodes = pairs
        .select(explode(array(col("doc_a"), col("doc_b"))).as("v")).distinct()
      val lab = nodes.join(labels, Seq("v"), "left_outer")
        .select(col("v"), coalesce(col("label"), col("v")).as("label"))
      val sizes = lab.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      lab.join(sizes, "label")
        .select(col("v").as("doc_id"), col("label").as("cluster_id"),
          col("cluster_size"))
        .orderBy(col("doc_id"))
        .localCheckpoint()
    } finally cached.unpersist()
  }

  /** #37d dedup_clusters_star: [[clusters]]' output contract computed
    * by [[ccStar]] — the variant to reach for when near-dup chains make
    * component diameter unbounded (label propagation's round count) at
    * trillion-edge scale. Shares the dedup_clusters DuckDB oracle. */
  def clustersStar(spark: SparkSession, dir: String): DataFrame =
    // Shares [[exactPairSet]]'s materialized pair frame and memoizes
    // its own checkpointed result — see clusters.
    approxPairCache.getOrCompute(spark, s"$dir#clusters_star")(
      ccStar(spark, exactPairSet(spark, dir)))

  /** #37c dedup_survivors: the dedup pipeline's final step — drop every
    * clustered doc except its cluster's min-id survivor, keeping all
    * unclustered docs. The corpus never shuffles for the check: the
    * dropped/winner sides carry NO forced broadcast hint — real web
    * corpora run 30-50% duplicates, where a forced broadcast of the
    * dropped-id set hits the broadcast wall; AQE/stats pick broadcast
    * on their own whenever the set actually is small. Emits the
    * surviving corpus as (doc_id, n_chars) plus a flag for whether the
    * doc won a cluster (vs was never duplicated). */
  def survivors(spark: SparkSession, dir: String): DataFrame = {
    // One clusters() call: its result is a materialized local
    // checkpoint, so both derived sides re-read that, not the pipeline.
    val cl = clusters(spark, dir)
    val dropped = cl.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"), lit(true).as("_dup"))
    val winners = cl.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id"), lit(true).as("_won"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n_chars"))
      .join(dropped, Seq("doc_id"), "left_anti")
      .join(winners, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("_won"), lit(false)).as("cluster_survivor"))
      .orderBy(col("doc_id"))
  }

  /** #37k dedup_survivor_weights: SOFT dedup — down-weight duplicates
    * instead of dropping them (the D4/SemDeDup-adjacent recipe: a
    * document in a near-dup cluster of size s trains with weight 1/s,
    * so every cluster contributes one document's worth of gradient
    * mass while keeping its internal variation available). The hard
    * pipeline ([[survivors]]) picks one winner per cluster; THIS
    * reports what the weighted alternative preserves, per source:
    * docs, duplicated docs, tokens, the effective (weighted) document
    * count, and the effective doc/token shares a mixing plan would
    * budget with. Weights are EXACT integers at ppm precision —
    * w_ppm = 10⁶ div cluster_size (10⁶ for unclustered docs) — so Σ1/s
    * needs no float fold and the whole report is integer math under
    * ratio4 presentation, hash-exact at any partitioning.
    *
    * Scale shape: rides the session-memoized cluster checkpoint (the
    * CC loop runs once per session, shared with survivors/the
    * funnel); cluster sizes are a pair-graph-sized aggregate; the
    * corpus joins the (doc, cluster) frame doc-keyed once, then ONE
    * map-side-combinable |sources|-key rollup. Token-weight products
    * ride DECIMAL(38,0)/HUGEINT (n_toks·10⁶ passes 2⁶³ at corpus
    * scale). */
  def survivorWeights(spark: SparkSession, dir: String): DataFrame = {
    val cl = clusters(spark, dir)
    val csz = cl.groupBy(col("cluster_id")).agg(count(lit(1)).as("csize"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(filter(split(col("text"), "\\s+"), t => t =!= ""))
          .cast("long").as("n_toks"))
    docs
      .join(cl.select(col("doc_id"), col("cluster_id")), Seq("doc_id"), "left_outer")
      .join(csz, Seq("cluster_id"), "left_outer")
      .withColumn("w_ppm", coalesce(expr("1000000 div csize"), lit(1000000L)))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(col("w_ppm")).as("w_sum"),
        sum(col("n_toks").cast("decimal(38,0)") * col("w_ppm")).as("wtok_sum"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"), col("n_tokens"),
        graft.functions.Exact.ratio4(col("w_sum"), lit(1000000L)).as("eff_docs"),
        graft.functions.Exact.ratio4(col("w_sum"),
          col("n_docs").cast("decimal(38,0)") * lit(1000000L)).as("eff_doc_share"),
        graft.functions.Exact.ratio4(col("wtok_sum"),
          nullif(col("n_tokens"), lit(0L)).cast("decimal(38,0)") * lit(1000000L))
          .as("eff_token_share"))
      .orderBy(col("source"))
  }

  /** #38 dedup_embedding: embedding near-dup via random-hyperplane LSH —
    * L=4 tables of 8-bit buckets; per vector, the best bucket-mate by
    * exact cosine. Per-vector output (this corpus has no true embedding
    * dups, so a thresholded pair list would be empty; the per-vector
    * nearest-candidate form is also what a dedup pipeline consumes).
    * Under the full hash gate: the seed-derived planes are inlined as
    * literals in the DuckDB replay, and both audit scalars use exact
    * (order-proof) aggregations — see SparkEntry.embeddingDedupOracleSql. */
  /** Memoized per-vector LSH-best frame — see the bestM comment below. */
  private val bestCache = new graft.functions.SessionScopedCache("dedup.emb_best")

  def embedding(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val dim = 64

    val banded = emb.select(
      col("vec_id"), col("embedding"),
      posexplode(array((0 until 4).map(t =>
        Sketches.hyperplaneBits(col("embedding"), seed = t + 1, nbits = 8, dim = dim)): _*)))
      .select(col("vec_id"), col("embedding"),
        col("pos").as("table_id"), col("col").as("bucket"))

    // Bucket-size cap via a count aggregation (O(1) buffer) + semi-join,
    // then an equality SELF-JOIN on the bucket key for pair generation:
    // join memory is spill-managed, so no aggregation buffer ever holds
    // a whole bucket's vectors (a degenerate bucket at 100 TB would OOM
    // a collect_list formulation).
    val okBuckets = banded
      .groupBy(col("table_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").between(2, 500))
      .select(col("table_id"), col("bucket"))
    val pruned = banded.join(okBuckets, Seq("table_id", "bucket"), "left_semi")

    val pairs = pruned
      .join(
        pruned.select(col("table_id"), col("bucket"),
          col("vec_id").as("cand_id"), col("embedding").as("cand_emb")),
        Seq("table_id", "bucket"))
      .filter(col("vec_id") =!= col("cand_id"))
      .dropDuplicates("vec_id", "cand_id")
      .select(col("vec_id"), col("cand_id"),
        Sketches.cosineSim(col("embedding"), col("cand_emb")).as("cos"))

    val best = pairs
      .groupBy(col("vec_id"))
      .agg(
        countDistinct(col("cand_id")).as("n_candidates"),
        max(struct(col("cos"), col("cand_id"))).as("best"))
      .select(col("vec_id"), col("best.cand_id").as("best_match"),
        col("best.cos").as("best_cos"), col("n_candidates"))

    // Sampled self-audit (the ANN-recall pattern for the rows-only
    // gate): exact nearest neighbor for the first 100 vectors by
    // brute-force cosine, then two constant columns — the fraction of
    // sampled vectors whose LSH best-match IS the true NN, and the
    // mean best-cos / true-NN-cos ratio (how close the bucket winner
    // gets when it isn't the argmax). Sampling keeps the audit
    // O(sample × corpus), the form that survives 100 TB.
    val sampleQ = emb.filter(col("vec_id") < 100)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val trueNn = emb
      .join(broadcast(sampleQ), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        Sketches.cosineSim(col("q_emb"), col("embedding")).as("cos"))
      .groupBy(col("q_id"))
      .agg(max(struct(col("cos"), col("vec_id"))).as("nn"))
      .select(col("q_id"), col("nn.vec_id").as("_true_nn"),
        col("nn.cos").as("_true_cos"))
    // The audit scalars are a 1-row aggregate of the ≤|sample| joined
    // rows, broadcast back onto the per-vector frame — NOT a global
    // window, which would funnel the corpus-cardinality result through
    // one task. The per-vector frame is materialized once per
    // (session, dir) — the same memoized-checkpoint discipline as
    // [[exactPairSet]] — so the audit branch and every later call
    // re-read the materialized frame instead of re-running the LSH
    // pipeline (an UNmemoized eager checkpoint re-ran the whole
    // pipeline outside AQE on every call: measured 3× the cost of the
    // pipeline itself at sf0.1). The cached frame is output-sized
    // (4 narrow columns per vector), not corpus-sized.
    val bestM = bestCache.getOrCompute(spark, dir)(best.localCheckpoint())
    // Both audit scalars are hash-gate exact: the recall mean sums 0/1
    // doubles (integer-valued partials — order-proof), and the cos
    // ratio is floored to integer ppm per row BEFORE the sum so the
    // aggregation is an exact long sum followed by one floor divide and
    // one correctly-rounded double divide — a double sum of arbitrary
    // ratios would be partial-aggregation-order dependent and
    // unreplayable cross-engine.
    val stats = bestM
      .join(broadcast(trueNn), col("vec_id") === col("q_id"))
      .agg(
        avg((col("best_match") === col("_true_nn")).cast("double"))
          .as("nn_recall_sampled"),
        sum(floor(lit(1e6) * (col("best_cos") / col("_true_cos"))))
          .as("_ppm"),
        count(lit(1)).as("_n"))
      .select(col("nn_recall_sampled"),
        (expr("_ppm div nullif(_n, 0)") / lit(1e6)).as("nn_cos_ratio_sampled"))
    bestM.crossJoin(broadcast(stats))
      .orderBy(col("vec_id"))
  }

  /** #38b dedup_semantic: SemDeDup-style cluster-partitioned semantic
    * dedup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication") — the OTHER standard
    * candidate-generation geometry next to [[embedding]]'s hyperplane
    * buckets: a deterministic spherical k-means
    * ([[graft.similarity.Kmeans.fittedCentroids]] — the hash-gated
    * emb_kmeans trainer) partitions the corpus into k clusters, and
    * near-dups are sought ONLY within a cluster: per vector, its
    * exact-cosine nearest in-cluster neighbor, with the SemDeDup
    * keep-lowest-id rule marking the higher id of a ≥ τ pair `is_dup`.
    *
    * Scale shape: assignment is a narrow codegen'd pass (centroids in
    * the plan), session-memoized so the trainer and the corpus
    * assignment run once, not once per consumer; candidate generation
    * shuffles the assigned corpus on the cluster id for the
    * within-cluster equality self-join (both sides corpus-shaped —
    * two exchanges) and the pair stream once more on vec_id for the
    * per-vector argmax — the Σ|cluster|² pair stream is the dominant
    * wire cost, bounded because k GROWS with the corpus as CODE, not
    * prose (VERDICT r15 #2): [[adaptiveSemanticK]] doubles k from 16
    * until k ≥ n/128, so mean cluster size is pinned near 128 and the
    * pair stream is ~128·n at any scale — SemDeDup's own k≈10⁵ at
    * web scale falls out of the same rule (τ and the keep rule are
    * unchanged by k). The trainer is
    * [[graft.similarity.Kmeans.fittedCentroidsSeeded]] — hash-ordered
    * corpus seeds + full-corpus Lloyd rounds — because an adaptive k
    * outgrows any driver-sample init (the kNN-graph quantizer lesson).
    * This corpus has no true embedding dups (the [[embedding]]
    * precedent), so the per-vector nearest-neighbor form — what a
    * dedup pipeline consumes — is the output, and is_dup is the
    * decision column.
    *
    * Under the full hash gate: the fit replays as the seeded-trainer
    * unrolled Lloyd chain with the oracle's `kdef` CTE computing the
    * same doubling rule, and everything after it is per-cluster joins
    * + the proven list_dot_product cosine fold
    * (SparkEntry.dedupSemanticOracleSql). */
  /** Accounted session memo for [[semantic]]'s assigned-corpus frame. */
  private val semanticAssignCache =
    new graft.functions.SessionScopedCache("dedup.semantic_assign")

  /** SemDeDup's cluster count as a RULE, not a knob: the smallest
    * power of 2 (from 16) with k ≥ n/128, capped only by the corpus
    * size — mean cluster size pinned near 128, so the within-cluster
    * pair stream stays ~128·n at any scale (a fixed k would be n²/k).
    * The same doubling discipline as the kNN-graph's nLists² ≥ n
    * ([[graft.similarity.Kmeans.adaptivePow2]]); mirrored by the
    * oracle's kdef CTE. The 2¹⁷ ceiling (SemDeDup's own web-scale
    * k ≈ 10⁵ class) bounds the driver/plan centroid matrix at
    * ~67 MB; past it (n ≳ 1.7·10⁷ vectors) mean cluster size grows
    * with n — the scale at which a real deployment shards the corpus
    * (by language/source) before semantic dedup rather than growing
    * one codebook without bound. */
  private[graft] def adaptiveSemanticK(n: Long): Int =
    graft.similarity.Kmeans.adaptivePow2(n, 1L << 17)(k => k * 128L >= n)

  /** `k = 0` (the default) resolves to [[adaptiveSemanticK]] of the
    * corpus's parquet-footer row count; an explicit positive k remains
    * the spec/tuning override. */
  def semantic(
      spark: SparkSession, dir: String, k: Int = 0, tau: Double = 0.9): DataFrame = {
    val kEff = if (k > 0) k
      else adaptiveSemanticK(Tables.parquetRowCount(spark, dir, "embeddings"))
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    // The k-means fit (5 corpus Lloyd rounds) and the assignment pass
    // run ONCE per session: the frame below has four consumers (both
    // self-join sides, the sizes aggregation, the final projection),
    // each of which would otherwise re-run the scan + k×d assignment
    // expression — and re-fit, since the fit happens at construction.
    val assigned = semanticAssignCache.getOrCompute(spark, s"$dir#$kEff") {
      val cents = graft.similarity.Kmeans
        .fittedCentroidsSeeded(emb, kEff, rounds = 5, salt = "#sem")
      // Parallelism floor: the assignment pass is k×d per row, and the
      // checkpoint inherits its partitioning — a single-partition
      // checkpoint would single-thread every downstream consumer's
      // map side too.
      graft.similarity.Kmeans
        .assignedTo(Tables.withMinParallelism(emb), cents).localCheckpoint()
    }

    val sizes = assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_cluster"))
    // Within-cluster pairs only: the equality self-join on the cluster
    // id IS the candidate pruning (never a corpus cross-join), and the
    // per-vector argmax keeps the output one row per vector.
    // Tie rule (deliberate departure from the house lowest-key argmax
    // encoding): max(struct(cos, cand_id)) resolves equal-cosine
    // candidates to the HIGHER cand_id. The winner can matter — tied
    // candidates straddling vec_id flip the best_match < vec_id test
    // — but the choice is safe because the oracle's SQL states the
    // identical struct-max rule (the two sides cannot disagree, at
    // any scale), and float-cosine ties are measure-zero on real
    // embeddings: they arise only between bit-identical vectors,
    // which the upstream exact dedup stages remove first in the
    // published SemDeDup recipe.
    // The within-cluster argmax is tau-INDEPENDENT and has two
    // first-class consumers (dedup_semantic and dedup_knn_cc's sem_dup
    // column) — memoized like the assignment it consumes
    // (OPTIMIZATION r16, guide §1.2: the within-cluster self-join is
    // the Σ|cluster|² pair stream, the dominant cost of the operator;
    // one per session, not one per consumer). The checkpoint is one
    // row per vector (id, match, cos).
    val best = semanticAssignCache.getOrCompute(spark, s"$dir#$kEff#best") {
      assigned
        .join(assigned.select(col("cluster"),
          col("vec_id").as("cand_id"), col("embedding").as("cand_emb")),
          Seq("cluster"))
        .filter(col("vec_id") =!= col("cand_id"))
        .select(col("vec_id"),
          col("cand_id"), Sketches.cosineSim(col("embedding"), col("cand_emb")).as("cos"))
        .groupBy(col("vec_id"))
        .agg(max(struct(col("cos"), col("cand_id"))).as("best"))
        .select(col("vec_id"), col("best.cand_id").as("best_match"),
          col("best.cos").as("best_cos"))
        .localCheckpoint()
    }

    assigned.select(col("vec_id"), col("cluster"))
      .join(broadcast(sizes), Seq("cluster"))
      .join(best, Seq("vec_id"), "left_outer")
      .select(
        col("vec_id"), col("cluster"), col("n_cluster"),
        col("best_match"), col("best_cos"),
        coalesce(col("best_cos") >= tau && col("best_match") < col("vec_id"),
          lit(false)).as("is_dup"))
      .orderBy(col("vec_id"))
  }

  /** #38c dedup_knn_cc: graph-based embedding dedup — the composition
    * the kNN graph ([[graft.similarity.Similarity.knnGraph]]) exists
    * for: MUTUAL kNN edges at or above a cosine threshold become the
    * near-dup pair graph, [[ccStar]] closes it transitively into
    * clusters, and the min-id survivor rule marks every non-root
    * `is_dup` — the third candidate-generation geometry beside
    * [[embedding]]'s hyperplane buckets and [[semantic]]'s k-means
    * cells, and the one that catches CHAINS (a≈b≈c with cos(a,c)
    * below τ) that per-vector argmax forms cannot.
    *
    * τ is pinned at 0.35 for the gate: this corpus has no true
    * embedding dups (max mutual-edge cosine ≈ 0.47 — the
    * [[embedding]]/[[semantic]] precedent), so the SemDeDup-standard
    * τ=0.9 would exercise CC on an empty graph; 0.35 yields multi-node
    * transitive components (sizes to 5 at sf0.01), which is exactly
    * what the composition must be gated ON. At real scale τ is the
    * operator's tuning knob, unchanged in shape.
    *
    * The report carries the cross-geometry audit the rollout decision
    * needs: `sem_dup` is [[semantic]]'s verdict at the SAME τ (its
    * own adaptive-k cells), and `dup_jaccard_vs_semantic` the constant Jaccard
    * between the two dup sets — how much the graph geometry and the
    * cell geometry agree before you pick one.
    *
    * Scale shape: the edge list is the kNN graph's n·k rows (mutual
    * check is the reversed-key self-join, linear in the graph); CC is
    * [[ccStar]]'s O(log² n) star rounds above the edge cap and exact
    * driver union-find below it; the semantic side re-reads the
    * memoized assigned-corpus checkpoint; the overlap scalar is a
    * 1-row aggregate broadcast back — no corpus-shaped collect
    * anywhere. */
  def knnCc(spark: SparkSession, dir: String, tau: Double = 0.35): DataFrame = {
    import graft.functions.Exact.ratio4
    val pairs = graft.similarity.Similarity.knnEdges(spark, dir)
      .filter(col("mutual") && col("cos") >= tau &&
        col("src_id") < col("dst_id"))
      .select(col("src_id").as("doc_a"), col("dst_id").as("doc_b"))
    val cc = ccStar(spark, pairs)
    val sem = semantic(spark, dir, tau = tau)
      .select(col("vec_id"), col("is_dup").as("sem_dup"))
    val assigned = Tables.embeddings(spark, dir).select(col("vec_id"))
      .join(cc.withColumnRenamed("doc_id", "vec_id"), Seq("vec_id"), "left_outer")
      .select(col("vec_id"),
        coalesce(col("cluster_id"), col("vec_id")).as("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
      .withColumn("is_dup", col("vec_id") =!= col("cluster_id"))
      .join(sem, Seq("vec_id"))
    // Dup-set Jaccard as a 1-row exact aggregate (integer counts into
    // ratio4), broadcast back onto the per-vector frame — the same
    // constant-audit pattern as the sketch recalls.
    val overlap = assigned.agg(
      sum(when(col("is_dup") && col("sem_dup"), 1L).otherwise(0L)).as("_i"),
      sum(when(col("is_dup") || col("sem_dup"), 1L).otherwise(0L)).as("_u"))
      .select(ratio4(col("_i"), greatest(col("_u"), lit(1L)))
        .as("dup_jaccard_vs_semantic"))
    assigned.crossJoin(broadcast(overlap))
      .select(col("vec_id"), col("cluster_id"), col("cluster_size"),
        col("is_dup"), col("sem_dup"), col("dup_jaccard_vs_semantic"))
      .orderBy(col("vec_id"))
  }
}
