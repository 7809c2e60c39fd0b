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

  test("bpe-ish token count >= whitespace token count") {
    val bad = Text.tokenStats(spark, sf)
      .filter(col("n_bpe_tokens") < col("n_ws_tokens")).count()
    assert(bad === 0)
  }
}
