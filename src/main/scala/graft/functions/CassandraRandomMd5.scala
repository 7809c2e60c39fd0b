package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Cassandra's RandomPartitioner token function.
  *
  * The token is |MD5(key)| where the 16-byte digest is read as a SIGNED
  * big-endian 128-bit two's-complement integer (Cassandra's
  * `BigInteger(md5).abs()`; behavior derived from the reference's C
  * implementation, Partitioners.cpp:28-61, and the public Cassandra
  * source). Token order in the reference is a bytewise memcmp of the
  * 16-byte token (Partitioners.cpp:63-74); since every |value| fits in
  * 127 bits, all tokens are exactly 16 bytes and a fixed-width 32-char
  * lowercase hex string preserves that order under plain string
  * comparison — which makes the token directly usable in range
  * predicates, ORDER BY, and partition pruning on any SQL engine.
  *
  * The ByteOrderedPartitioner and OrderPreservingPartitioner need no
  * expression at all: both order by the raw key bytes (memcmp /
  * std::string::compare, Partitioners.cpp:212-240 — identical total
  * orders), which Spark's binary string comparison and `lower(hex(key))`
  * tokens already express; see [[graft.kv.Kv.byteOrderedScan]].
  */
object CassandraRandomMd5 {

  private val HexChars = "0123456789abcdef".toCharArray

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 16-byte abs-of-MD5 token (two's-complement negation in place,
    * mirroring Partitioners.cpp:44-59: from the least-significant byte
    * up, trailing zeros stay zero, the first non-zero byte is
    * 0x100 - b, every byte above it 0xff - b). */
  def tokenBytes(key: Array[Byte]): Array[Byte] = {
    val md = digests.get()
    md.reset()
    val d = md.digest(key)
    if ((d(0) & 0x80) != 0) {
      var i = 15
      while (i >= 0 && d(i) == 0) i -= 1
      if (i >= 0) { d(i) = (0x100 - (d(i) & 0xff)).toByte; i -= 1 }
      while (i >= 0) { d(i) = (0xff - (d(i) & 0xff)).toByte; i -= 1 }
    }
    d
  }

  /** Fixed-width 32-char lowercase hex form of [[tokenBytes]]. */
  def token(key: Array[Byte]): UTF8String = {
    val d = tokenBytes(key)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2) = HexChars((d(i) >> 4) & 0xf).toByte
      out(i * 2 + 1) = HexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  def token(key: UTF8String): UTF8String = token(key.getBytes)

  def tokenHex(key: String): String =
    token(key.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  /** Column API: `random_partitioner_token(key)`. */
  def randomToken(c: Column): Column =
    ColumnBridge.column(CassandraRandomMd5Token(ColumnBridge.expression(c)))
}

case class CassandraRandomMd5Token(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"random_partitioner_token requires string or binary input, got $other")
  }

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String  => CassandraRandomMd5.token(s)
    case b: Array[Byte] => CassandraRandomMd5.token(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CassandraRandomMd5.token($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
