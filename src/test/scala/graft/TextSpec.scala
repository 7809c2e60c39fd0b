package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches
import graft.text.Text

/** Oracles for the rows-only text operators (langid, fingerprint). */
class TextSpec extends AnyFunSuite {
  import SparkTestSession._

  test("langid identifies real multilingual samples") {
    val sparkS = spark
    import sparkS.implicits._
    val fixtures = Seq(
      (1L, "the cat sat on the mat and looked to the door with a sigh", "en"),
      (2L, "der hund ist nicht in das haus und die katze ist mit dem kind", "de"),
      (3L, "le chat est dans la maison et les enfants ne sont pas dans le jardin", "fr"),
      (4L, "el perro no es una mascota y los gatos son animales por la noche", "es"),
      (5L, "今天天气很好我们一起去公园散步吧这是一个美好的日子", "zh"))
    // Reuse the operator's scoring logic over an in-memory frame by
    // round-tripping through a temp view shaped like documents.
    val docs = fixtures.map { case (id, t, l) => (id, t, l, "srcX", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("langid").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val pred = Text.langid(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fixtures.foreach { case (id, _, want) =>
      assert(pred(id) === want, s"doc $id predicted ${pred(id)}, want $want")
    }
  }

  test("langid on the real corpus is deterministic and total") {
    val a = Text.langid(spark, sf).collect().map(_.toString)
    val b = Text.langid(spark, sf).collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("winnow fingerprint: equal strings share all, near-dups share most") {
    val s1 = "the quick brown fox jumps over the lazy dog again and again"
    val s2 = "the quick brown fox leaps over the lazy dog again and again"
    val far = "completely unrelated content with nothing in common here at all"
    def fp(s: String): Set[Long] = {
      val arr = Sketches.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, 4)
      arr.toLongArray().toSet
    }
    assert(fp(s1) === fp(s1))
    val overlap = (fp(s1) & fp(s2)).size.toDouble / (fp(s1) | fp(s2)).size
    assert(overlap > 0.5, s"near-dup fingerprint overlap $overlap")
    val farOverlap = (fp(s1) & fp(far)).size.toDouble / (fp(s1) | fp(far)).size
    assert(farOverlap < 0.1, s"unrelated overlap $farOverlap")
  }

  test("fingerprint operator emits one deterministic digest per doc") {
    val rows = Text.fingerprint(spark, sf).collect()
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getInt(1) > 0, s"doc ${r.getLong(0)} has no fingerprints")
    }
    val again = Text.fingerprint(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("c4 filter battery: every rule fires and the verdict matches the signals") {
    val rows = Text.c4Filters(spark, sf).collect()
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    val reasons = rows.map(_.getAs[String]("drop_reason")).toSet
    // The %2/%7/%11/%13 decoration guarantees each of these fires.
    Seq("curly_brace", "lorem_ipsum", "javascript", "no_terminal_punct", "kept")
      .foreach(r => assert(reasons.contains(r), s"rule '$r' never fired"))
    rows.foreach { r =>
      val (curly, lorem, js, punct) = (r.getAs[Boolean]("has_curly"),
        r.getAs[Boolean]("has_lorem"), r.getAs[Boolean]("has_javascript"),
        r.getAs[Boolean]("ends_punct"))
      val want =
        if (curly) "curly_brace"
        else if (lorem) "lorem_ipsum"
        else if (js) "javascript"
        else if (!punct) "no_terminal_punct"
        else if (r.getAs[Int]("n_words") < 5) "too_short"
        else if (r.getAs[Double]("mean_word_len") < 3.0 ||
                 r.getAs[Double]("mean_word_len") > 10.0) "word_length"
        else "kept"
      assert(r.getAs[String]("drop_reason") === want, s"doc ${r.getLong(0)}")
      assert(r.getAs[Boolean]("kept") === (want == "kept"))
      // Decoration determinism: the flag columns follow doc_id exactly.
      val id = r.getLong(0)
      assert(curly === (id % 7 == 0), s"doc $id curly")
      assert(lorem === (id % 13 == 0), s"doc $id lorem")
      assert(js === (id % 11 == 0), s"doc $id js")
    }
  }

  test("corpus mix cells partition the corpus and shares sum to one") {
    val rows = Text.corpusMix(spark, sf).collect()
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === graft.sources.Tables.documents(spark, sf).count())
    val shareSum = rows.map(_.getAs[Double]("token_share")).sum
    // Each cell is d4-rounded, so the sum can drift by n_cells * 5e-5.
    assert(math.abs(shareSum - 1.0) <= rows.length * 5e-5,
      s"token shares sum to $shareSum over ${rows.length} cells")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_tokens") > 0 && r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Double]("avg_doc_tokens") > 0.0)
    }
  }

  test("seq packing offsets equal a sequential driver-side pack") {
    val toks = Text.tokenStats(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(3).toLong).sortBy(_._1)
    var off = 0L
    val want = toks.map { case (id, n) =>
      val o = off; off += n
      val first = o / 2048
      val last = (o + math.max(n, 1L) - 1L) / 2048
      (id, (n, o, first, last, first != last))
    }.toMap
    val got = Text.seqPacking(spark, sf).collect().map { r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    }.toMap
    assert(got === want)
    assert(got.values.exists(_._5), "some doc must straddle a 2048 boundary")
  }

  test("bpe-ish token count >= whitespace token count") {
    val bad = Text.tokenStats(spark, sf)
      .filter(col("n_bpe_tokens") < col("n_ws_tokens")).count()
    assert(bad === 0)
  }

  /** Writes a documents.parquet fixture and returns its table dir. */
  private def docsFixture(rows: Seq[(Long, String)]): String = {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("textfix").toString
    rows.map { case (id, t) => (id, t, "xx", s"src${id % 3}", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("bigram LM: fluent text scores head, gibberish tail, singletons empty") {
    // The sf0.01 synthetic corpus is fluency-homogeneous (every doc
    // lands in head at the CCNet-style fixed cutoffs), so the
    // bucketing's DISCRIMINATION is proven here on a planted corpus:
    // a doc of one repeated bigram (every step maximally predictable),
    // a doc of 500 once-only tokens (every bigram at the smoothing
    // floor), and a single-token doc (no bigrams at all).
    val fluent = Seq.fill(300)("a b").mkString(" ")
    val gibberish = (0 until 500)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val dir = docsFixture(Seq(0L -> fluent, 1L -> gibberish, 2L -> "a"))

    // Model head: (a,b) dominates with hand-checkable smoothing.
    // V = 2 + 500 = 502 distinct tokens; c(a,b) = 300; c(a) = 301
    // (300 in the fluent doc + the singleton doc).
    val top = Text.bigramLmTop(spark, dir, k = 5).collect().head
    assert(top.getAs[Int]("rank") === 1)
    assert(top.getAs[String]("tok_a") === "a" && top.getAs[String]("tok_b") === "b")
    assert(top.getAs[Long]("n_ab") === 300L)
    assert(top.getAs[Long]("n_a") === 301L)
    assert(top.getAs[Long]("p_ppb") === math.round(301.0 * 1e9 / 803.0),
      "add-one smoothing: (n_ab+1)*1e9 / (n_a+V), HALF_UP to integer ppb")

    val got = Text.lmScore(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(0L).getAs[Long]("n_bigrams") === 599L)
    assert(got(0L).getAs[String]("bucket") === "head")
    assert(got(1L).getAs[String]("bucket") === "tail",
      s"smoothing-floor doc must land in tail: ${got(1L)}")
    assert(got(2L).getAs[String]("bucket") === "empty")
    assert(got(2L).getAs[Long]("n_bigrams") === 0L)
    assert(got(2L).getAs[Double]("score_ppm") === 0.0)
    assert(got(0L).getAs[Double]("score_ppm") > got(1L).getAs[Double]("score_ppm"))
  }

  test("lmScoreAgainst: unseen bigrams get the smoothing floor, never dropped (r13)") {
    // Train on corpus A (the bigram-LM fixture), score corpus B.
    val fluent = Seq.fill(300)("a b").mkString(" ")
    val gibberish = (0 until 500)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}")
      .mkString(" ")
    val trainDir = docsFixture(Seq(0L -> fluent, 1L -> gibberish, 2L -> "a"))
    val model = Text.bigramLm(spark, trainDir)
      .select(col("tok_a"), col("tok_b"), col("p_ppb"))
    val uni = Text.tokenCounts(spark, trainDir)
      .select(col("token").as("tok_a"), col("n_occurrences").as("n_a"))
    val v = Text.tokenCounts(spark, trainDir).count() // 502 distinct tokens

    // Same-corpus parity: the floor branch never fires, so the
    // train/apply form agrees bit-for-bit with the inner-join operator.
    val trainDocs = spark.read.parquet(s"$trainDir/documents.parquet")
    val viaAgainst = Text.lmScoreAgainst(trainDocs, model, uni, v)
      .collect().map(_.toString).sorted
    val viaSame = Text.lmScore(spark, trainDir)
      .collect().map(_.toString).sorted
    assert(viaAgainst.sameElements(viaSame), "same-corpus parity")

    // Cross-corpus: "a zz" has bigram (a, zz) — left token seen, the
    // bigram and zz unseen (gibberish first letters stop at 't') —
    // and "zz zq" is unseen on both sides. The inner-join plan would
    // drop both (n_bigrams = 0 → "empty"); the apply form must count
    // them at their smoothing floors.
    val applyDir = docsFixture(Seq(10L -> "a zz", 11L -> "zz zq"))
    val applyDocs = spark.read.parquet(s"$applyDir/documents.parquet")
    val got = Text.lmScoreAgainst(applyDocs, model, uni, v)
      .collect().map(r => r.getLong(0) -> r).toMap
    // n_a("a") = 301 in corpus A; floor(a, zz) = round(1e9/(301+502)).
    val floorSeenLeft = math.round(1e9 / 803.0)
    // zz unseen → n_a = 0; floor(zz, zq) = round(1e9/502).
    val floorUnseenLeft = math.round(1e9 / 502.0)
    assert(got(10L).getAs[Long]("n_bigrams") === 1L, "unseen bigram is scored, not dropped")
    assert(got(10L).getAs[Double]("score_ppm") ===
      math.round(floorSeenLeft * 10.0) / 10000.0)
    assert(got(11L).getAs[Long]("n_bigrams") === 1L)
    assert(got(11L).getAs[Double]("score_ppm") ===
      math.round(floorUnseenLeft * 10.0) / 10000.0)
    // Both land in a real bucket — never "empty" (they have bigrams).
    assert(got(10L).getAs[String]("bucket") !== "empty")
    assert(got(11L).getAs[String]("bucket") !== "empty")
  }

  test("quality_curve: keep rates fall monotonically as the threshold rises") {
    val rows = Text.qualityCurve(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Double]("threshold")).toSeq ===
      Seq(0.3, 0.4, 0.5, 0.6, 0.7))
    val kept = rows.map(_.getAs[Long]("n_kept"))
    val fracs = rows.map(_.getAs[Double]("kept_frac"))
    val tokFracs = rows.map(_.getAs[Double]("token_frac"))
    assert(kept.sliding(2).forall(w => w(0) >= w(1)), kept.mkString(","))
    assert(fracs.forall(f => f >= 0.0 && f <= 1.0))
    assert(tokFracs.forall(f => f >= 0.0 && f <= 1.0))
    // The curve must actually discriminate on this corpus — a flat
    // curve means the score or the explode is broken.
    assert(kept.head > kept.last,
      s"flat curve: ${kept.mkString(",")}")
  }

  test("novelty measures the shared-shingle fraction per document") {
    // doc 1 and doc 3 share an 8-token passage (doc 3 embeds it in
    // unique text); doc 5 is fully unique; docs 7 and 9 are short
    // (< 8 tokens) exact twins — their single whole-text gram is
    // shared, so both read 100% shared.
    val passage = "p1 p2 p3 p4 p5 p6 p7 p8"
    val dir = docsFixture(Seq(
      1L -> passage,
      3L -> s"$passage u1 u2 u3 u4 u5 u6 u7",
      5L -> "q1 q2 q3 q4 q5 q6 q7 q8 q9",
      7L -> "tiny doc",
      9L -> "tiny doc"))
    val got = Text.novelty(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 3L, 5L, 7L, 9L))
    // doc 1: exactly one shingle (the passage), present in doc 3 too.
    assert(got(1L).getAs[Long]("n_shingles") === 1L)
    assert(got(1L).getAs[Long]("n_shared") === 1L)
    assert(got(1L).getAs[Double]("shared_frac") === 1.0)
    assert(got(1L).getAs[Boolean]("mostly_dup"))
    // doc 3: 8 shingles (15 tokens), only the leading one is shared.
    assert(got(3L).getAs[Long]("n_shingles") === 8L)
    assert(got(3L).getAs[Long]("n_shared") === 1L)
    assert(got(3L).getAs[Double]("shared_frac") === 0.125)
    assert(!got(3L).getAs[Boolean]("mostly_dup"))
    // doc 5: 2 shingles, none shared.
    assert(got(5L).getAs[Long]("n_shared") === 0L)
    assert(got(5L).getAs[Double]("shared_frac") === 0.0)
    // the short twins share their whole-text gram.
    assert(got(7L).getAs[Long]("n_shingles") === 1L)
    assert(got(7L).getAs[Double]("shared_frac") === 1.0)
    assert(got(9L).getAs[Boolean]("mostly_dup"))
  }

  test("contamination matrix localizes leaks to the right (source, benchmark) cell") {
    // Eval docs: 0 (benchmark (0 div 20) % 4 = 0) and 20 (benchmark 1),
    // with distinct 8-token passages. Train doc 1 (source src1) leaks
    // passage A; train doc 7 (also src1) leaks passage B; train doc 3
    // (src0) is clean.
    val pa = "a1 a2 a3 a4 a5 a6 a7 a8"
    val pb = "b1 b2 b3 b4 b5 b6 b7 b8"
    val dir = docsFixture(Seq(
      0L -> pa, 20L -> pb,
      1L -> s"$pa t1 t2 t3",
      7L -> s"u1 u2 $pb",
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9"))
    val got = Text.contaminationMatrix(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r).toMap
    // Dense: 2 train sources x 4 benchmarks.
    assert(got.size === 8)
    assert(got(("src1", 0)).getAs[Long]("n_contaminated") === 1L)
    assert(got(("src1", 1)).getAs[Long]("n_contaminated") === 1L)
    assert(got(("src1", 0)).getAs[Double]("contaminated_frac") === 0.5)
    (0 until 4).foreach { b =>
      assert(got(("src0", b)).getAs[Long]("n_contaminated") === 0L)
    }
    assert(got(("src1", 2)).getAs[Long]("n_contaminated") === 0L)
    assert(got(("src1", 3)).getAs[Long]("n_contaminated") === 0L)
  }

  test("decontaminate flags train docs sharing an 8-gram with the eval slice") {
    // doc 0 is eval (0 % 20 == 0); doc 1 shares its first 8 tokens,
    // doc 3 shares nothing.
    val dir = docsFixture(Seq(
      0L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9",
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2",
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"))
    val got = Text.decontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.keySet === Set(1L, 3L), "eval docs must not appear")
    assert(got(1L).getAs[Long]("n_hits") === 1L)
    assert(got(1L).getAs[Boolean]("contaminated"))
    assert(got(1L).getAs[Int]("n_ngrams") === 3)
    assert(got(3L).getAs[Long]("n_hits") === 0L)
    assert(!got(3L).getAs[Boolean]("contaminated"))
  }

  test("temperature sampling flattens a skewed source mix toward sqrt shares") {
    val sparkS = spark
    import sparkS.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("tempfix").toString
    // 900 docs from srcBig, 100 from srcSmall: raw shares 90/10,
    // sqrt shares 75/25 — the flattening the op exists for.
    val rows = (0L until 900L).map(i => (i, s"big doc $i", "xx", "srcBig", 10L)) ++
      (1000L until 1100L).map(i => (i, s"small doc $i", "xx", "srcSmall", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Text.sampleTemperature(spark, tmp).collect()
      .map(r => r.getString(0) -> r).toMap
    val big = got("srcBig"); val small = got("srcSmall")
    // Budget = 500 docs. w ∝ √n: √900=30, √100=10 → targets 375/125.
    assert(big.getAs[Long]("target_docs") === 375L)
    assert(small.getAs[Long]("target_docs") === 125L)
    // Small source is UPsampled relative to its raw share: its rate
    // (125/100 → capped 100%) far exceeds the big source's (375/900).
    assert(small.getAs[Long]("rate_ppm") === 1000000L)
    assert(big.getAs[Long]("rate_ppm") === 416666L)
    // The deterministic sampler realizes the rate on its own docs.
    assert(small.getAs[Long]("n_sampled") === 100L)
    val realized = big.getAs[Long]("n_sampled").toDouble / 900.0
    assert(math.abs(realized - 0.4167) < 0.06, s"realized $realized")
  }

  test("shard plan conserves tokens and deals sequences balanced within one") {
    val rows = Text.shardPlan(spark, sf).collect()
    assert(rows.length === 16)
    val totalTokens = Text.seqPacking(spark, sf)
      .agg(sum(col("n_tokens"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === totalTokens,
      "round-robin dealing must conserve every token")
    val seqs = rows.map(_.getAs[Long]("n_seqs"))
    assert(seqs.max - seqs.min <= 1, s"unbalanced deal: ${seqs.toSeq}")
    assert(rows.forall(r => r.getAs[Long]("n_seqs") === 0L ||
      r.getAs[Long]("n_docs") >= 1L),
      "a shard holding sequences must be touched by at least one doc")
  }

  test("bloom decontamination is bit-identical to the exact semi-join") {
    // The bloom prefilter may only drop rows the exact semi-join would
    // drop anyway; false positives die in the verify join. Checked on
    // the real corpus so the filter sees realistic gram cardinality.
    val exact = Text.decontaminate(spark, sf).collect()
    val bloom = Text.decontaminateBloom(spark, sf).collect()
    assert(exact.toSeq === bloom.toSeq)
  }

  test("repetition computes exact gram fractions on a planted doc") {
    val dir = docsFixture(Seq(
      1L -> "a b a b a b",          // 2-grams: ab×3 ba×2; 3-grams: aba×2 bab×2
      2L -> "one two three four"))  // all grams unique
    val got = Text.repetition(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getAs[Int]("n_tokens") === 6)
    assert(r1.getAs[Int]("n_distinct") === 2)
    assert(r1.getAs[Double]("distinct_ratio") === 0.3333)
    assert(r1.getAs[Double]("top_2gram_frac") === 0.6)    // 3/5
    assert(r1.getAs[Double]("dup_2gram_frac") === 1.0)    // all repeated
    assert(r1.getAs[Double]("top_3gram_frac") === 0.5)    // 2/4
    assert(r1.getAs[Double]("dup_3gram_frac") === 1.0)
    val r2 = got(2L)
    assert(r2.getAs[Double]("dup_2gram_frac") === 0.0)
    assert(r2.getAs[Double]("top_2gram_frac") === 0.3333) // 1/3
  }

  test("pii scrub counts and redacts emails, phones, and IPs exactly") {
    val dir = docsFixture(Seq(1L -> "hello world", 12L -> "other text"))
    val got = Text.piiScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: one email (1%3!=0), one phone (1%4!=0), one ip.
    assert(got(1L).getAs[Int]("n_emails") === 1)
    assert(got(1L).getAs[Int]("n_phones") === 1)
    assert(got(1L).getAs[Int]("n_ips") === 1)
    // doc 12: extra email (12%3==0) and extra phone (12%4==0).
    assert(got(12L).getAs[Int]("n_emails") === 2)
    assert(got(12L).getAs[Int]("n_phones") === 2)
    // Cross-check the exact redaction output via the same Java regexes.
    def expected(id: Long, text: String): String = {
      val full = text +
        s" contact user$id@mail${id % 7}.example.com" +
        (if (id % 3 == 0) s" cc admin${id % 11}@corp.example.org" else "") +
        s" phone +1-555-${"%04d".format(id % 10000)}" +
        (if (id % 4 == 0) s" fax 212-555-${"%04d".format((id * 3) % 10000)}" else "") +
        s" ip 10.${id % 256}.${(id * 7) % 256}.${(id * 13) % 256}"
      full.replaceAll(Text.EmailRe, "<EMAIL>")
        .replaceAll(Text.PhoneRe, "<PHONE>")
        .replaceAll(Text.IpRe, "<IP>")
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    Seq(1L -> "hello world", 12L -> "other text").foreach { case (id, t) =>
      val e = expected(id, t)
      assert(!e.contains("@") && !e.contains("10."), s"unredacted PII in: $e")
      assert(got(id).getAs[String]("redacted_md5") === md5hex(e))
      assert(got(id).getAs[Int]("n_chars_redacted") === e.length)
    }
  }

  test("stratified sample is deterministic and self-consistent") {
    val a = Text.sampleStratified(spark, sf).collect()
    val b = Text.sampleStratified(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.foreach { r =>
      val rate = r.getAs[Int]("rate_pct")
      val srcNum = r.getAs[String]("source").filter(_.isDigit).toInt
      assert(rate === 5 + (srcNum * 7) % 90)
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("realized_pct") >= 0.0 &&
        r.getAs[Double]("realized_pct") <= 100.0)
    }
  }

  test("tfidf ranks a planted corpus exactly (smooth raw inverse frequency)") {
    // N = 3; score = tf * (N+1)/(df+1). apple df=1, banana df=2,
    // cherry df=2, durian df=1. Ties rank lexicographically (doc 2:
    // banana and cherry both score 4/3).
    val dir = docsFixture(Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "cherry cherry durian")))
    val got = Text.tfidf(spark, dir).collect().map { r =>
      (r.getLong(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
    }.toMap
    assert(got === Map(
      (1L, 1) -> (("apple", 2L, 1L, 4.0)),
      (1L, 2) -> (("banana", 1L, 2L, 1.3333)),
      (2L, 1) -> (("banana", 1L, 2L, 1.3333)),
      (2L, 2) -> (("cherry", 1L, 2L, 1.3333)),
      (3L, 1) -> (("cherry", 2L, 2L, 2.6667)),
      (3L, 2) -> (("durian", 1L, 1L, 2.0))))

    // Corpus: <= 5 ranked terms per doc, ranks contiguous from 1,
    // scores non-increasing within a doc, deterministic across runs.
    val rows = Text.tfidf(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { rs =>
      val ranked = rs.sortBy(_.getInt(1))
      assert(ranked.map(_.getInt(1)).toSeq === (1 to ranked.length))
      assert(ranked.length <= 5)
      val scores = ranked.map(_.getDouble(5))
      assert(scores.zip(scores.drop(1)).forall { case (a, b) => a >= b })
    }
    val again = Text.tfidf(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("vocab ranks a planted corpus with exact cumulative coverage") {
    // Tokens (BPE-ish): d1 -> [aa, aa, bb, '!'], d2 -> [aa, cc].
    // Counts: aa 3 (2 docs), bb 1 (1), cc 1 (1), ! 1 (1); total 6.
    // Rank ties lexicographically: '!' < 'bb' < 'cc'.
    val dir = docsFixture(Seq((1L, "aa aa bb!"), (2L, "aa cc")))
    val got = Text.vocab(spark, dir).collect().map { r =>
      (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))
    }
    assert(got.toSeq === Seq(
      (1, "aa", 3L, 2L, 0.5),
      (2, "!", 1L, 1L, 0.6667),
      (3, "bb", 1L, 1L, 0.8333),
      (4, "cc", 1L, 1L, 1.0)))

    // Corpus: at most 100 rows (the synthetic vocabulary is small),
    // ranks contiguous from 1, counts non-increasing, coverage
    // non-decreasing and closing at 1 when the vocab fits, deterministic.
    val rows = Text.vocab(spark, sf).collect()
    assert(rows.length <= 100 && rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq === (1 to rows.length))
    if (rows.length < 100) assert(rows.last.getDouble(4) === 1.0)
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b })
    val cov = rows.map(_.getDouble(4))
    assert(cov.zip(cov.drop(1)).forall { case (a, b) => a <= b })
    assert(cov.last <= 1.0)
    assert(rows.map(_.toString).sameElements(Text.vocab(spark, sf).collect().map(_.toString)))
  }

  test("bpe training replays exactly against an in-memory reference trainer") {
    import graft.text.Bpe
    // Reference trainer: same pre-tokenization, same word-frequency
    // weighting, same (count desc, left, right) argmax tie-break, same
    // leftmost-first greedy merge application.
    val words = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
      .flatMap(t => Text.BpePattern.r.findAllIn(t.toLowerCase).toSeq)
      .filter(_.length <= 64)
      .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    def chars(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    var table: Vector[(Vector[String], Long)] =
      words.toVector.map { case (w, f) => (chars(w) :+ Bpe.WordEnd) -> f }
    val n = 12
    val want = Vector.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= n && !exhausted) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      table.foreach { case (syms, f) =>
        syms.zip(syms.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), cnt) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
        want += ((rank, a, b, a + b, cnt))
        table = table.map { case (syms, f) =>
          syms.foldLeft(Vector.empty[String])((acc, x) =>
            if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
            else acc :+ x) -> f
        }
        rank += 1
      }
    }
    val got = Bpe.train(spark, sf, nMerges = n).collect().map(r =>
      (r.getInt(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toVector
    assert(got === want.result())
    assert(got.map(_._1) === (1 to got.size).toVector)
    assert(got.forall { case (_, a, b, m, _) => m == a + b })
  }

  test("bpe encode applies the learned table losslessly, matching a rank-greedy replay") {
    import graft.text.Bpe
    val merges = Bpe.train(spark, sf).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val ranks = merges.zipWithIndex.toMap
    def chars(w: String): Vector[String] =
      w.codePoints().toArray.toVector.map(cp => new String(Character.toChars(cp)))
    def encodeRef(w: String): Vector[String] = {
      var syms = chars(w) :+ Bpe.WordEnd
      var go = true
      while (go && syms.length > 1) {
        val cands = syms.zip(syms.drop(1)).zipWithIndex
          .flatMap { case (p, i) => ranks.get(p).map(r => (r, i)) }
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.minBy(identity)
          syms = syms.patch(i, Seq(syms(i) + syms(i + 1)), 2)
        }
      }
      syms
    }
    // In-memory per-doc expectation over the same pre-tokenization.
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val want = docs.flatMap { case (id, t) =>
      val words = Text.BpePattern.r.findAllIn(t.toLowerCase).toSeq
      if (words.isEmpty) None // no pre-tokens -> no row after the explode
      else {
        val encoded = words.map(encodeRef)
        Some((id, words.size.toLong, encoded.map(_.size.toLong).sum,
          words.map(_.length.toLong).sum, 1))
      }
    }.sortBy(_._1).toSeq
    val got = Bpe.encode(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    assert(got === want)
    // The learned tokenizer must compress: fewer tokens than raw
    // chars+wordend on this corpus.
    assert(got.map(_._3).sum < got.map(_._4).sum + got.map(_._2).sum,
      "25 merges should compress below the char baseline")
  }

  test("bpe fertility slices conserve the encode totals and ratios bound correctly") {
    import graft.text.Bpe
    val rows = Bpe.fertility(spark, sf).collect()
    assert(rows.nonEmpty)
    // The (lang, source) rollup re-slices the SAME encode pass the
    // per-doc report aggregates — totals must conserve exactly.
    val enc = Bpe.encode(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_words")).sum ===
      enc.map(_.getAs[Long]("n_words")).sum)
    assert(rows.map(_.getAs[Long]("n_bpe_tokens")).sum ===
      enc.map(_.getAs[Long]("n_bpe_tokens")).sum)
    assert(rows.map(_.getAs[Long]("n_chars")).sum ===
      enc.map(_.getAs[Long]("n_chars")).sum)
    rows.foreach { r =>
      // Every word encodes to >= 1 token, so fertility >= 1; a token
      // never outgrows its word + the word-end mark.
      assert(r.getAs[Double]("fertility") >= 1.0)
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_words"))
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
  }

  test("ngram coverage matches a driver-side shingle-df recount") {
    import graft.text.Text
    val rows = Text.ngramCoverage(spark, sf).collect()
    // In-memory replay of the house shingle rule: lowercase,
    // whitespace tokens, 3-gram windows space-joined (whole doc when
    // shorter), DISTINCT per doc; df counts documents.
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def shOf(t: String): Set[String] = {
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty).toVector
      if (toks.isEmpty) Set.empty
      else if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    }
    val perDoc = docs.map { case (id, src, t) => (id, src, shOf(t)) }
      .filter(_._3.nonEmpty)
    val dfMap = perDoc.flatMap(_._3).groupBy(identity).map { case (s, o) => (s, o.length) }
    val bySource = perDoc.groupBy(_._2)
    assert(rows.length === bySource.size)
    rows.foreach { r =>
      val ds = bySource(r.getAs[String]("source"))
      val slots = ds.flatMap(d => d._3.toSeq.map(s => (d._1, s)))
      val dup = slots.count { case (_, s) => dfMap(s) >= 2 }
      assert(r.getAs[Long]("n_docs") === ds.length.toLong)
      assert(r.getAs[Long]("n_slots") === slots.length.toLong)
      assert(r.getAs[Long]("dup_slots") === dup.toLong)
      assert(r.getAs[Long]("n_distinct") === slots.map(_._2).distinct.length.toLong)
      assert(r.getAs[Long]("n_dup_distinct") ===
        slots.map(_._2).distinct.count(s => dfMap(s) >= 2).toLong)
    }
  }

  test("collocations match a driver-side bigram recount") {
    import SparkTestSession._
    val rows = graft.text.Text.collocations(spark, sf, k = 20).collect()
    assert(rows.length === 20)
    // Exact recount of every bigram in the corpus, same tokenizer.
    val pat = graft.text.Text.BpePattern.r
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val biCounts = new scala.collection.mutable.HashMap[(String, String), Long]
    val uniCounts = new scala.collection.mutable.HashMap[String, Long]
    docs.foreach { t =>
      val ts = pat.findAllIn(t.toLowerCase).toArray
      ts.foreach(x => uniCounts.update(x, uniCounts.getOrElse(x, 0L) + 1))
      ts.sliding(2).foreach {
        case Array(a, b) => biCounts.update((a, b), biCounts.getOrElse((a, b), 0L) + 1)
        case _ => ()
      }
    }
    rows.foreach { r =>
      val key = (r.getAs[String]("tok_a"), r.getAs[String]("tok_b"))
      assert(r.getAs[Long]("n_ab") === biCounts(key), s"bigram count wrong for $key")
      assert(r.getAs[Long]("n_a") === uniCounts(key._1))
      assert(r.getAs[Long]("n_b") === uniCounts(key._2))
      // Each occurrence of a starts at most one (a, b) bigram.
      assert(r.getAs[Long]("n_ab") <= math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
      assert(r.getAs[Double]("lift") > 0.0)
    }
    // The top-20 really is the top: no corpus bigram outcounts rank 1.
    val maxCount = biCounts.values.max
    assert(rows.head.getAs[Long]("n_ab") === maxCount)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
  }

  test("lang_mix rolls up exactly langid's verdicts per source") {
    import SparkTestSession._
    val rows = graft.text.Text.langMix(spark, sf).collect()
    val pred = graft.text.Text.langid(spark, sf)
      .select("doc_id", "pred_lang").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val src = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = src.groupBy { case (id, s) => (s, pred(id)) }
      .map { case (k, v) => k -> v.length.toLong }
    assert(rows.map(r => (r.getAs[String]("source"), r.getAs[String]("pred_lang")))
      .toSet === want.keySet)
    rows.foreach { r =>
      val k = (r.getAs[String]("source"), r.getAs[String]("pred_lang"))
      assert(r.getAs[Long]("n_docs") === want(k), s"cell count wrong for $k")
    }
    // Shares partition each source.
    rows.groupBy(_.getAs[String]("source")).values.foreach { rs =>
      assert(math.abs(rs.map(_.getAs[Double]("share")).sum - 1.0) < 0.001)
    }
  }

  test("len_hist buckets tile the corpus and bound their members") {
    import SparkTestSession._
    val rows = graft.text.Text.lenHist(spark, sf).collect()
    val docs = graft.sources.Tables.documents(spark, sf)
      .selectExpr("length(text) as n").collect().map(_.getAs[Int]("n").toLong)
    assert(rows.map(_.getAs[Long]("n_docs")).sum === docs.length.toLong)
    assert(rows.map(_.getAs[Long]("n_chars")).sum === docs.sum)
    rows.foreach { r =>
      val (lo, hi) = (r.getAs[Long]("lo"), r.getAs[Long]("hi"))
      if (r.getAs[Int]("bucket_exp") >= 0) {
        assert(hi === 2 * lo - 1, "power-of-two bucket bounds")
        val members = docs.filter(n => n >= lo && n <= hi)
        assert(members.length.toLong === r.getAs[Long]("n_docs"))
        assert(members.sum === r.getAs[Long]("n_chars"))
      }
    }
    assert(rows.last.getAs[Double]("cum_char_coverage") === 1.0)
  }

  test("readability ratios are the exact floor-x100 of their counts") {
    import SparkTestSession._
    val rows = graft.text.Text.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val w = r.getAs[Long]("n_words"); val s = r.getAs[Long]("n_sentences")
      val c = r.getAs[Long]("n_nonspace_chars")
      assert(s >= 1)
      assert(r.getAs[Double]("words_per_sentence") === (100 * w / s) / 100.0)
      assert(r.getAs[Double]("chars_per_word") === (100 * c / math.max(w, 1)) / 100.0)
    }
  }

  test("gopher_filters: every decorated rule fires on its planted subset") {
    import SparkTestSession._
    val rows = Text.gopherFilters(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    byId.foreach { case (id, r) =>
      val reason = r.getAs[String]("drop_reason")
      ((id % 23).toInt) match {
        case 0 =>
          // Symbol padding: ceil(n0/6) '#' words over ~7n0/6 total
          // words is >= 1/7 > 0.1 at any n0.
          assert(r.getAs[Double]("symbol_ratio") > 0.1, s"doc $id: $r")
          assert(reason === "symbol_ratio", s"doc $id: $reason")
        case 1 =>
          // Numeric padding: ceil(n0/3) digit words push alpha share
          // to <= 3/4 < 0.8 at any n0.
          assert(r.getAs[Double]("alpha_ratio") < 0.8, s"doc $id: $r")
          assert(reason === "alpha_words", s"doc $id: $reason")
        case 2 =>
          // Fully bulletized: every line starts with '- '.
          assert(r.getAs[Double]("bullet_ratio") === 1.0, s"doc $id: $r")
          assert(reason === "bullet_lines", s"doc $id: $reason")
        case 3 =>
          // The single line ends '...'; a very short doc can trip the
          // (earlier-in-chain) symbol rule on that same ellipsis —
          // faithful to Gopher, which counts '...' as a symbol.
          assert(r.getAs[Double]("ellipsis_ratio") === 1.0, s"doc $id: $r")
          val want = if (r.getAs[Double]("symbol_ratio") > 0.1)
            "symbol_ratio" else "ellipsis_lines"
          assert(reason === want, s"doc $id: $reason != $want")
        case _ =>
          // Undecorated docs can only fail the natural Gopher rules.
          assert(Set("stopwords", "word_length", "word_count", "kept")(reason),
            s"doc $id: unexpected reason $reason")
      }
      // Ratio sanity on every row.
      Seq("symbol_ratio", "bullet_ratio", "ellipsis_ratio", "alpha_ratio")
        .foreach { c => val v = r.getAs[Double](c)
          assert(v >= 0.0 && (c == "symbol_ratio" || v <= 1.0), s"$c=$v: $r") }
    }
    // The stopword-presence rule must fire somewhere naturally: the
    // word-salad corpus has docs with fewer than 2 of the Gopher 8.
    assert(rows.exists(_.getAs[String]("drop_reason") == "stopwords"))
  }

  test("sample_split: splits partition the corpus and shares are exact") {
    import SparkTestSession._
    val rows = Text.sampleSplit(spark, sf).collect()
    val splits = rows.map(_.getAs[String]("split")).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
    val total = graft.sources.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    // Membership checksum: id sums per split must partition the corpus
    // id sum (any reassignment of one doc moves two split checksums).
    val idTotal = graft.sources.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("doc_id")).head().getLong(0)
    assert(rows.map(_.getAs[Long]("id_checksum")).sum === idTotal)
    val trainShare = rows.find(_.getAs[String]("split") == "train")
      .get.getAs[Double]("share")
    assert(trainShare > 0.9, s"train share $trainShare")
    // Assignment is by key, not position: re-running over a
    // repartitioned corpus is bit-identical.
    val a = rows.map(_.toString).sorted
    val b = Text.sampleSplit(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
