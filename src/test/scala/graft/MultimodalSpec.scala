package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** The multimodal pipeline's Spark plumbing contract (SURVEY §2.7):
  * schema, batching shape, determinism. The codec is a stub by design.
  */
class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("media table has the opaque-binary + typed-metadata schema") {
    val schema = Multimodal.mediaTable(spark, sf).schema
    assert(schema("payload").dataType.typeName === "binary")
    assert(schema("format").dataType.typeName === "string")
    assert(schema("width").dataType.typeName === "integer")
    assert(schema("height").dataType.typeName === "integer")
  }

  test("feature extraction is batched (batch_size <= BatchSize, >1 for bulk)") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.batch_size <= Multimodal.BatchSize))
    assert(feats.exists(_.batch_size > 1), "bulk partitions should batch")
    assert(feats.forall(_.feat.length === Multimodal.FeatDim))
  }

  test("stub decode is deterministic and features are normalized") {
    val a = Multimodal.pipeline(spark, sf).collect().map(_.toString)
    val b = Multimodal.pipeline(spark, sf).collect().map(_.toString)
    assert(a.nonEmpty && a.sameElements(b))
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).take(20)
    feats.foreach { f =>
      val l1 = f.feat.map(_.toDouble).sum
      assert(math.abs(l1 - 1.0) < 1e-3, s"histogram not normalized: $l1")
    }
  }

  test("resize bounds metadata and payload consistently") {
    val resized = Multimodal.resize(Multimodal.mediaTable(spark, sf), 128, 128).collect()
    assert(resized.nonEmpty)
    resized.foreach { m =>
      assert(m.width <= 128 && m.height <= 128)
      assert(m.payload.length >= 1)
    }
    // Idempotent: resizing an already-fitting image is a no-op.
    def canon(ms: Array[graft.multimodal.Multimodal.MediaRow]) = ms
      .map(m => (m.doc_id, m.width, m.height, m.format, m.payload.toSeq)).sortBy(_._1)
    val once = Multimodal.resize(Multimodal.mediaTable(spark, sf), 128, 128)
    val twice = Multimodal.resize(once, 128, 128).collect()
    assert(canon(twice) === canon(resized))
  }

  test("frame sampling keeps every stride-th frame, deterministically") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, sf), frameBytes = 64, stride = 3).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_idx % 3 == 0))
    assert(frames.forall(f => f.n_bytes > 0 && f.n_bytes <= 64))
    val again = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, sf), 64, 3).collect()
    assert(frames.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("pipeline output is one row per document") {
    val n = Multimodal.pipeline(spark, sf).count()
    val docs = graft.sources.Tables.documents(spark, sf).count()
    assert(n === docs)
  }

  test("frame-sample driver query matches a byte-level driver recount") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hexUp(bs: Array[Byte]) = bs.map(b => f"$b%02X").mkString
    def hexLo(bs: Array[Byte]) = bs.map(b => f"$b%02x").mkString
    val want = docs.flatMap { case (id, payload) =>
      val h = hexUp(payload)
      val nFrames = math.max((payload.length + 63) / 64, 1)
      (0 until nFrames by 4).map { f =>
        val sub = h.substring(math.min(f * 128, h.length),
          math.min(f * 128 + 128, h.length))
        ((id, f), (math.min(64, payload.length - f * 64),
          hexLo(md.digest(sub.getBytes("UTF-8")))))
      }
    }.toMap
    val got = Multimodal.frameSample(spark, sf).collect().map { r =>
      ((r.getLong(0), r.getInt(2)), (r.getInt(3), r.getString(4)))
    }.toMap
    assert(got === want)
    assert(got.keys.exists(_._2 >= 4), "long payloads must sample multiple frames")
  }

  test("corpus audit partitions the media table and agrees with its metadata") {
    val media = Multimodal.mediaTable(spark, sf).collect()
    val rows = Multimodal.corpusAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === media.map(_.format).toSet)
    assert(rows.values.map(_.getAs[Long]("n_items")).sum === media.length)
    assert(rows.values.map(_.getAs[Long]("total_bytes")).sum ===
      media.map(_.payload.length.toLong).sum)
    media.groupBy(_.format).foreach { case (fmt, ms) =>
      val r = rows(fmt)
      assert(r.getAs[Long]("max_bytes") === ms.map(_.payload.length).max.toLong)
      assert(r.getAs[Long]("n_oversize") ===
        ms.count(m => m.width.toLong * m.height > 16384).toLong)
      assert(r.getAs[Long]("n_empty") === ms.count(_.payload.isEmpty).toLong)
    }
  }

  test("sample_balanced: byte budgets, bounded rates, recounted decisions") {
    val rows = Multimodal.sampleBalanced(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val media = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.keySet === media.map(_.format).toSet)
    // Budget accounting: per-format byte targets never exceed the
    // half-corpus budget in total, rates are valid ppm, and the
    // sampled bytes respect the format's own supply.
    val corpusBytes = media.map(_.payload.length.toLong).sum
    assert(rows.values.map(_.getAs[Long]("target_bytes")).sum <= corpusBytes / 2)
    rows.values.foreach { r =>
      val rate = r.getAs[Long]("rate_ppm")
      assert(rate >= 0L && rate <= 1000000L)
      assert(r.getAs[Long]("bytes_sampled") <= r.getAs[Long]("total_bytes"))
      assert(r.getAs[Long]("n_sampled") <= r.getAs[Long]("n_items"))
    }
    // The keep/drop decision is the deterministic md5-ppm predicate:
    // recount one format driver-side.
    val fmt = rows.keySet.head
    val expected = media.filter(_.format == fmt).count { m =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"${m.doc_id}#$fmt".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      java.lang.Long.parseLong(hex, 16) % 1000000L <
        rows(fmt).getAs[Long]("rate_ppm")
    }
    assert(rows(fmt).getAs[Long]("n_sampled") === expected.toLong)
  }

  test("phash dedup: planted in-place near-duplicates are found with certainty") {
    // The media-edit model: payload length fixed, bytes change in
    // place. An edit confined to k regions flips at most k of the 64
    // fingerprint bits, so with the Hamming<=3 gate and the exact
    // 4-band candidate join, recall on <=3-region edits is 1.0 BY
    // CONSTRUCTION — this pins it, plus the non-dup rejection.
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(42)
    val n = 6400 // 100 bytes per region
    val base = Array.fill(n)(rnd.nextInt(256).toByte)
    val exactDup = base.clone()
    val nearDup = base.clone()
    // Edits inside regions 2, 17 and 40 only (region r = bytes [100r, 100r+100)).
    Seq(205, 1717, 4040, 4099).foreach(i => nearDup(i) = (nearDup(i) ^ 0x5a).toByte)
    val unrelated = Array.fill(n)(rnd.nextInt(256).toByte)
    val media = Seq(
      (1L, base), (2L, exactDup), (3L, nearDup), (4L, unrelated))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashesOf(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pairs(1L) === pairs(2L), "identical payloads must collide exactly")
    assert(java.lang.Long.bitCount(pairs(1L) ^ pairs(3L)) <= 3,
      "a 3-region edit can flip at most 3 bits")
    assert(java.lang.Long.bitCount(pairs(1L) ^ pairs(4L)) > 3,
      "an unrelated payload must not land within the gate (seed-pinned)")
  }

  test("blockhash64 expression bit-matches the composed md5-substring form (the oracle's closed form)") {
    // The DuckDB oracle states the fingerprint as 64 independent
    // md5-over-hex-substring terms; the engine computes all 64 bits in
    // one codegen'd pass. This pins the expression to the composed
    // Spark form (same operators the oracle replays) across the edge
    // regimes: empty payload (64 md5('') regions), nb < 64 (empty
    // regions interleaved), region-boundary lengths, and bit 63's
    // two's-complement contribution.
    val sparkS = spark
    import sparkS.implicits._
    val rnd = new scala.util.Random(7)
    val docs = Seq(0, 1, 7, 63, 64, 65, 100, 129, 4096).zipWithIndex.map {
      case (n, id) => (id.toLong, Array.fill(n)(rnd.nextInt(256).toByte))
    }
    val hexed = docs.toDF("doc_id", "payload")
      .select(col("doc_id"), hex(col("payload")).as("h"),
        length(col("payload")).cast("long").as("nb"))
    val composed = hexed
      .select(col("doc_id"), col("h"), col("nb"),
        explode(sequence(lit(0), lit(63))).as("i"))
      .withColumn("startb", expr("(CAST(i AS BIGINT) * nb) div 64"))
      .withColumn("endb", expr("((CAST(i AS BIGINT) + 1) * nb) div 64"))
      .withColumn("bit",
        substring(md5(expr("substring(h, startb * 2 + 1, (endb - startb) * 2)")
          .cast("binary")), 1, 1) >= "8")
      .withColumn("contrib",
        when(!col("bit"), 0L)
          .when(col("i") === 63, lit(Long.MinValue))
          .otherwise(expr("shiftleft(1L, i)")))
      .groupBy(col("doc_id")).agg(sum(col("contrib")).as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expr64 = Multimodal.phashesFromHex(hexed)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expr64 === composed)
    // Empty payload: every region is md5('') whose top hex digit is
    // 'd' -> all 64 bits set -> -1, on both forms.
    assert(expr64(0L) === -1L)
  }

  test("phash band join equals the naive all-pairs Hamming join on the corpus") {
    // The exactness claim behind the DuckDB oracle's theta-join: the
    // 4x16-bit band equality join finds EVERY pair at Hamming <= 3
    // (pigeonhole) and the verify filter kills everything else.
    val hashes = Multimodal.phashesFromHex(Multimodal.phashCorpusHex(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val naive = (for {
      (ida, ha) <- hashes; (idb, hb) <- hashes
      if ida < idb && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ida, idb, java.lang.Long.bitCount(ha ^ hb))).toSet
    val banded = Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(banded === naive,
      s"banded=${banded.size} naive=${naive.size} pairs diverge")
    assert(naive.exists(_._3 == 0), "planted exact copies must pair at hamming 0")
    assert(naive.exists(p => p._3 > 0 && p._3 <= 3),
      "planted in-place edits must pair at 0 < hamming <= 3")
  }

  test("phash pipeline conserves the corpus: clusters partition pairs, survivors = corpus - losers") {
    val corpus = Multimodal.phashCorpusHex(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val pairs = Multimodal.phashDedup(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val cl = Multimodal.phashClusters(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // Every pair endpoint is clustered, both endpoints share a label,
    // and the label is the component's min id.
    assert(cl.keySet === clustered)
    pairs.foreach { case (a, b) => assert(cl(a) === cl(b), s"split pair ($a,$b)") }
    cl.foreach { case (v, lab) => assert(lab <= v && cl(lab) === lab) }
    // Survivors = whole corpus minus every clustered non-winner; the
    // winner flag marks exactly the cluster minima.
    val surv = Multimodal.phashSurvivors(spark, sf).collect()
    val losers = cl.filter { case (v, lab) => v != lab }.keySet
    assert(surv.map(_.getAs[Long]("doc_id")).toSet === corpus -- losers)
    assert(surv.filter(_.getAs[Boolean]("cluster_survivor"))
      .map(_.getAs[Long]("doc_id")).toSet === cl.values.toSet)
  }

  test("mm_curation_report: a monotone funnel consistent with the stages it composes") {
    val rows = SparkEntry.queries("mm_curation_report")(spark, sf).collect()
    assert(rows.map(_.getAs[String]("stage_name")).toSeq ===
      Seq("raw", "decodable", "dedup", "sample"))
    // Monotone in both items and bytes; shares in [0, 1] and exactly 1
    // at the raw stage.
    val items = rows.map(_.getAs[Long]("n_items"))
    val bytes = rows.map(_.getAs[Long]("n_bytes"))
    assert(items.zip(items.tail).forall { case (a, b) => b <= a })
    assert(bytes.zip(bytes.tail).forall { case (a, b) => b <= a })
    assert(rows.head.getAs[Double]("pct_items") === 1.0)
    assert(rows.head.getAs[Double]("pct_bytes") === 1.0)
    rows.foreach { r =>
      assert(r.getAs[Double]("pct_items") >= 0.0 && r.getAs[Double]("pct_items") <= 1.0)
      assert(r.getAs[Double]("pct_bytes") >= 0.0 && r.getAs[Double]("pct_bytes") <= 1.0)
    }
    // Stage 0 is the companion-augmented corpus the dedup stage sees...
    val aug = Multimodal.phashDedup(spark, sf) // warms the memo; corpus size below
    val corpusN = Multimodal.phashSurvivors(spark, sf).count() +
      Multimodal.phashClusters(spark, sf)
        .filter(col("doc_id") =!= col("cluster_id")).count()
    assert(items(0) === corpusN)
    // ...and the dedup stage keeps exactly the survivor set (every
    // payload in the fixture is non-empty, so the decode gate is a
    // pass-through there — asserted rather than assumed).
    assert(items(1) === items(0))
    assert(items(2) === Multimodal.phashSurvivors(spark, sf).count())
    // The sample stage realizes roughly the half-byte budget: alpha =
    // 0.5 flattening reallocates across formats but the total sampled
    // bytes stay within a loose band of half the post-dedup bytes at
    // fixture scale.
    assert(bytes(3) <= bytes(2))
    assert(bytes(3) > 0L)
  }
}
