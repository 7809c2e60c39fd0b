package graft

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FrozenCollections

/** Frozen-collection element access: the blob layout is Cassandra's
  * public CollectionSerializer form (protocol v3+) — int32 count, then
  * int32-length-prefixed elements (-1 = null), maps interleaving key
  * and value. Encoded independently here; decoded by the expressions
  * under test, standalone and through SQL + explode (the consumer
  * shape for a migrated frozen column).
  */
class FrozenCollectionsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def frozenList(elems: Seq[Option[Array[Byte]]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(elems.size)
    elems.foreach {
      case Some(b) => out.writeInt(b.length); out.write(b)
      case None => out.writeInt(-1)
    }
    out.flush(); bos.toByteArray
  }

  private def frozenMap(entries: Seq[(Array[Byte], Array[Byte])]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(entries.size)
    entries.foreach { case (k, v) =>
      out.writeInt(k.length); out.write(k)
      out.writeInt(v.length); out.write(v)
    }
    out.flush(); bos.toByteArray
  }

  test("frozen list/set elements decode in order, nulls and empties preserved") {
    val sparkS = spark
    import sparkS.implicits._
    val blob = frozenList(Seq(
      Some("alpha".getBytes(UTF_8)), None, Some(Array.emptyByteArray),
      Some("beta".getBytes(UTF_8))))
    val got = Seq(Tuple1(blob)).toDF("value")
      .select(FrozenCollections.frozenListElements(col("value")).as("es"))
      .selectExpr("transform(es, e -> cast(e AS STRING)) AS strs")
      .collect().head.getSeq[String](0)
    assert(got === Seq("alpha", null, "", "beta"))
    // Empty collection decodes to an empty array.
    val empty = Seq(Tuple1(frozenList(Nil))).toDF("value")
      .select(size(FrozenCollections.frozenListElements(col("value"))))
      .collect().head.getInt(0)
    assert(empty === 0)
  }

  test("frozen map entries decode as key/value structs through SQL + explode") {
    val sparkS = spark
    import sparkS.implicits._
    org.apache.spark.sql.graftbridge.ColumnBridge
      .registerExtensionFunctions(spark, new GraftExtensions)
    val blob = frozenMap(Seq(
      "k1".getBytes(UTF_8) -> "v1".getBytes(UTF_8),
      "k2".getBytes(UTF_8) -> "v2".getBytes(UTF_8)))
    Seq(Tuple1(blob)).toDF("value").createOrReplaceTempView("frozen_fixture")
    val got = spark.sql(
      """SELECT cast(e.key AS STRING) AS k, cast(e.value AS STRING) AS v
        |FROM frozen_fixture
        |LATERAL VIEW explode(frozen_map_entries(value)) AS e
        |ORDER BY k""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(got.toSeq === Seq(("k1", "v1"), ("k2", "v2")))
  }

  test("malformed frozen blobs fail loudly, never partially decode") {
    def decodeAll(b: Array[Byte]): Unit = FrozenCollections.listElements(b)
    // Truncated element, implausible count, trailing bytes.
    val truncated = frozenList(Seq(Some("abcdef".getBytes(UTF_8)))).dropRight(3)
    intercept[IllegalArgumentException](decodeAll(truncated))
    val badCount = Array[Byte](0x7f, 0x7f, 0x7f, 0x7f)
    intercept[IllegalArgumentException](decodeAll(badCount))
    val trailing = frozenList(Seq(Some("x".getBytes(UTF_8)))) ++ Array[Byte](1)
    intercept[IllegalArgumentException](decodeAll(trailing))
    intercept[IllegalArgumentException](
      FrozenCollections.mapEntries(frozenMap(
        Seq("k".getBytes(UTF_8) -> "v".getBytes(UTF_8))).dropRight(1)))
  }
}
