package graft

import java.nio.charset.StandardCharsets

import com.google.common.hash.Hashing
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CassandraMurmur3

/** The Cassandra Murmur3 variant differs from standard Murmur3_x64_128
  * ONLY in (a) sign-extended tail bytes and (b) Long.MinValue pinned to
  * MaxValue. So for inputs whose bytes are all < 0x80 the token must
  * equal the first 64 bits of guava's (correct) Murmur3_128 — an
  * independent oracle — and for high-bit inputs it must differ exactly
  * when a tail byte is negative.
  */
class CassandraMurmur3Spec extends AnyFunSuite {

  private def guavaH1(bytes: Array[Byte]): Long =
    Hashing.murmur3_128().hashBytes(bytes).asBytes().take(8)
      .zipWithIndex.map { case (b, i) => (b & 0xffL) << (8 * i) }.reduce(_ | _)

  test("matches guava Murmur3_128 h1 for ASCII keys (no sign-extension path)") {
    val rng = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val bytes = Array.fill(rng.nextInt(80))((rng.nextInt(128)).toByte)
      assert(CassandraMurmur3.token(bytes) === guavaH1(bytes))
    }
  }

  test("matches guava for all-ASCII keys of every length 0..64") {
    (0 to 64).foreach { n =>
      val bytes = Array.tabulate(n)(i => ((i * 7 + 13) % 128).toByte)
      assert(CassandraMurmur3.token(bytes) === guavaH1(bytes),
        s"mismatch at length $n")
    }
  }

  test("high-bit tail bytes take Cassandra's sign-extension path") {
    // 0x80 in the tail: guava zero-extends, Cassandra sign-extends.
    val bytes = Array(0x80.toByte)
    assert(CassandraMurmur3.token(bytes) !== guavaH1(bytes))
    // But a high-bit byte inside a full 16-byte block is read with & 0xff
    // on both sides, so blocks still agree.
    val block = Array.tabulate(16)(i => (0x80 + i).toByte)
    assert(CassandraMurmur3.token(block) === guavaH1(block))
  }

  test("deterministic and total-ordering-friendly") {
    val k1 = "user:42".getBytes(StandardCharsets.UTF_8)
    assert(CassandraMurmur3.token(k1) === CassandraMurmur3.token(k1))
  }

  test("expression evaluates inside a Spark plan (codegen path)") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq("8", "46", "7").toDF("key")
      .withColumn("token", CassandraMurmur3.cassandraToken(org.apache.spark.sql.functions.col("key")))
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map(
      "8"  -> CassandraMurmur3.token("8".getBytes(StandardCharsets.UTF_8)),
      "46" -> CassandraMurmur3.token("46".getBytes(StandardCharsets.UTF_8)),
      "7"  -> CassandraMurmur3.token("7".getBytes(StandardCharsets.UTF_8)))
    assert(got === want)
  }
}
