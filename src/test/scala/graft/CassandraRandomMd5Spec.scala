package graft

import java.math.BigInteger
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CassandraRandomMd5
import graft.kv.Kv

/** RandomPartitioner token fixtures (Partitioners.cpp:28-74): the token
  * is |MD5(key)| as a signed big-endian 128-bit two's-complement value.
  * Verified three ways: hardcoded vectors (computed independently with
  * BigInteger(md5).abs()), a property cross-check against BigInteger
  * over arbitrary keys, and order preservation of the hex encoding.
  */
class CassandraRandomMd5Spec extends AnyFunSuite {
  import SparkTestSession._

  // Independently derived fixtures: abs of the MD5 digest read as a
  // signed big-endian 128-bit integer, printed as 32-char lowercase hex.
  private val vectors = Seq(
    // MD5("") = d41d8cd9... (MSB set -> negated)
    "" -> "2be2732670ff4dfb167ff6671307bd82",
    // MD5("a") = 0cc175b9... (MSB clear -> digest verbatim)
    "a" -> "0cc175b9c0f1b6a831c399e269772661",
    // MD5("abc") = 900150... (MSB set -> negated)
    "abc" -> "6ffeaf67c32db04f2969c082d71e808e",
    "message digest" -> "0694968283486c72ada5d0ce550e9e30",
    "42" -> "5e2f3917c0fd8cd827b9ef9c0b53a75a",
    "user:1001" -> "126bd4e4523136890f57e2bb7e76fec6")

  test("known token vectors match byte-for-byte") {
    vectors.foreach { case (key, want) =>
      assert(CassandraRandomMd5.tokenHex(key) === want, s"key '$key'")
    }
  }

  test("binary keys and the two's-complement negation edge cases") {
    // Raw bytes (not valid UTF-8 text) go through the BinaryType path.
    val k = Array[Byte](0, 1, 2, -1)
    assert(CassandraRandomMd5.token(k).toString === "0416dab819887333af831f8c765ac2ae")
  }

  test("token equals BigInteger(md5).abs() for arbitrary keys") {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 500).foreach { i =>
      val key = s"key-$i-${"x" * (i % 17)}".getBytes(UTF_8)
      md.reset()
      val want = new BigInteger(md.digest(key)).abs()
      val got = new BigInteger(1, CassandraRandomMd5.tokenBytes(key))
      assert(got === want, s"key ${new String(key, UTF_8)}")
      assert(CassandraRandomMd5.tokenBytes(key).length === 16)
    }
  }

  test("hex encoding preserves the 16-byte memcmp token order") {
    val keys = (0 until 300).map(i => s"u$i")
    val byBytes = keys.sortBy(k => CassandraRandomMd5.tokenBytes(k.getBytes(UTF_8))
      .map(b => b & 0xff).toIndexedSeq)(
      math.Ordering.Implicits.seqOrdering[IndexedSeq, Int])
    val byHex = keys.sortBy(CassandraRandomMd5.tokenHex)
    assert(byBytes === byHex)
  }

  test("the codegen'd expression agrees with the Scala kernel") {
    import spark.implicits._
    val df = (0 until 200).map(i => s"user:$i").toDF("key")
      .withColumn("token", CassandraRandomMd5.randomToken(col("key")))
    df.collect().foreach { r =>
      assert(r.getString(1) === CassandraRandomMd5.tokenHex(r.getString(0)))
    }
  }

  test("random resume scan returns exactly the ring suffix, in ring order") {
    val out = Kv.randomResumeScan(spark, sf).collect()
    val startToken = CassandraRandomMd5.tokenHex("42")
    assert(out.nonEmpty)
    // Every returned row is at-or-after the (token, key) resume point...
    out.foreach { r =>
      val (tok, key) = (r.getString(0), r.getString(1))
      assert(tok > startToken || (tok == startToken && key >= "42"))
      assert(tok === CassandraRandomMd5.tokenHex(key))
    }
    // ...in (token, key) ring order, and nothing eligible was dropped.
    val pairs = out.map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(pairs === pairs.sorted)
    val full = Kv.lwwLatest(spark, sf).collect()
    val wantKeys = full.map(_.getString(0)).distinct
      .filter(k => CassandraRandomMd5.tokenHex(k) > startToken ||
        (CassandraRandomMd5.tokenHex(k) == startToken && k >= "42")).toSet
    assert(out.map(_.getString(1)).toSet === wantKeys)
  }

  test("byte-ordered scan is the key-suffix of the LWW table in key order") {
    val out = Kv.byteOrderedScan(spark, sf).collect()
    val full = Kv.lwwLatest(spark, sf).collect()
    val want = full.filter(_.getString(0) >= "42")
      .map(r => (r.getString(0), r.getString(1))).sorted
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq === want.toSeq)
  }

  test("random token distribution buckets cover the abs ring and count all cells") {
    val rows = Kv.randomTokenDistribution(spark, sf).collect()
    val buckets = rows.map(_.getInt(0))
    assert(buckets.forall(b => b >= 0 && b <= 0x80))
    assert(buckets.distinct.length === buckets.length)
    val totalCells = rows.map(_.getLong(1)).sum
    assert(totalCells === Kv.cells(spark, sf).count())
  }
}
