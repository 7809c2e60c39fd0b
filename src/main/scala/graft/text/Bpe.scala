package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed BPE tokenizer TRAINING (Sennrich et al. 2016, "Neural
  * Machine Translation of Rare Words with Subword Units") — the step
  * [[Text.vocab]] only reports inputs for: learn the ordered merge
  * table that IS a byte-pair tokenizer.
  *
  * Scale shape — the load-bearing fact is WHERE the loop runs: the
  * corpus is touched exactly once, by the same pre-tokenizer scan
  * text_vocab uses, collapsing it into a WORD-FREQUENCY table whose
  * row count is the distinct-word vocabulary (Zipf-bounded,
  * dimension-sized — this is how production subword trainers work on
  * large corpora), and every BPE round after that is two small
  * distributed jobs over that frame: an adjacent-pair count
  * aggregation, and the merge applied as a higher-order fold — never
  * another corpus pass. The only driver-side values are the per-round
  * argmax pair (ONE row per round, the bounded-scalar class the CC
  * loops' convergence signatures established) and the final
  * ≤`nMerges`-row merge table itself — the tokenizer artifact.
  * Lineage is truncated with `localCheckpoint` every few rounds
  * exactly like the dedup_clusters loop.
  */
object Bpe {

  /** Classic end-of-word sentinel: merges never cross word
    * boundaries, and a merged token ending in it marks a full-word
    * token. */
  val WordEnd = "</w>"

  /** struct(a, b) for every adjacent symbol pair of `syms`, in
    * order: pair i = (syms[i], syms[i+1]). */
  private def adjacentPairs(syms: Column): Column =
    transform(slice(syms, lit(1), size(syms) - 1),
      (s, i) => struct(s.as("a"),
        element_at(syms, (i + 2).cast("int")).as("b")))

  /** One BPE merge applied left-to-right as a fold: append each
    * symbol, but when the accumulator ends in `a` and the next symbol
    * is `b`, replace that tail with the merged token. The `get`
    * (0-based, null out of range) keeps the empty-accumulator probe
    * ANSI-safe, and the leftmost-first greedy semantics ("aaa" with
    * merge (a,a) → ["aa", "a"]) are exactly the reference BPE
    * behavior the in-memory spec oracle replays. */
  private def mergePair(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        get(acc, size(acc) - 1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** #44l text_bpe_train: the ordered merge table — columns
    * (rank, left, right, merged, pair_count), where pair_count is the
    * word-frequency-weighted corpus occurrence count of the pair at
    * merge time. Deterministic: count ties break on (left, right)
    * lexicographically, so the table is exact and the ScalaTest
    * oracle asserts it verbatim (not SQL-expressible — the loop's
    * argmax feeds the next round — so the driver entry is rows-only
    * by design, like the sketches). */
  def train(spark: SparkSession, dir: String, nMerges: Int = 25): DataFrame = {
    import spark.implicits._
    val words = Tables.documents(spark, dir)
      .select(explode(regexp_extract_all(lower(col("text")),
        lit(Text.BpePattern), lit(0))).as("word"))
      // Malformed-input guard: no unbounded symbol arrays from a
      // pathological unbroken "word" (same cap class as the df caps
      // in the dedup inverted indexes).
      .filter(length(col("word")) <= 64)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        concat(split(col("word"), ""), array(lit(WordEnd))).as("syms"))
    var cur = words.localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val top = cur
        .select(col("freq"), explode(adjacentPairs(col("syms"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect() // ONE row: this round's argmax pair
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += ((rank, a, b, a + b, cnt))
        cur = cur.withColumn("syms", mergePair(col("syms"), a, b))
        if (rank % 5 == 0) cur = cur.localCheckpoint()
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
  }
}
