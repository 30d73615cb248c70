package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** RIPEMD-160 — ClickHouse `ripeMD160(s)` (the one hash-family member
  * the JDK doesn't ship). Implemented from the PUBLISHED
  * Dobbertin/Bosselaers/Preneel specification (the two-line, 5×16-step
  * compression with the standard selection/rotation tables) and pinned
  * to the spec's official test vectors in RipeMD160Spec ('',
  * 'a', 'abc', 'message digest', the alphabet, the quick-brown-fox
  * value the CH docs example shows). Returns 20 BINARY bytes like the
  * SHA family registrations (`hex()` for the printable form).
  */
object RipeMD160Impl {

  // message-word selection, line 1 then line 2 (5 rounds × 16)
  private val R1 = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    7, 4, 13, 1, 10, 6, 15, 3, 12, 0, 9, 5, 2, 14, 11, 8,
    3, 10, 14, 4, 9, 15, 8, 1, 2, 7, 0, 6, 13, 11, 5, 12,
    1, 9, 11, 10, 0, 8, 12, 4, 13, 3, 7, 15, 14, 5, 6, 2,
    4, 0, 5, 9, 7, 12, 2, 10, 14, 1, 3, 8, 11, 6, 15, 13)
  private val R2 = Array(
    5, 14, 7, 0, 9, 2, 11, 4, 13, 6, 15, 8, 1, 10, 3, 12,
    6, 11, 3, 7, 0, 13, 5, 10, 14, 15, 8, 12, 4, 9, 1, 2,
    15, 5, 1, 3, 7, 14, 6, 9, 11, 8, 12, 2, 10, 0, 4, 13,
    8, 6, 4, 1, 3, 11, 15, 0, 5, 12, 2, 13, 9, 7, 10, 14,
    12, 15, 10, 4, 1, 5, 8, 7, 6, 2, 13, 14, 0, 3, 9, 11)
  // per-step left-rotation amounts, line 1 then line 2
  private val S1 = Array(
    11, 14, 15, 12, 5, 8, 7, 9, 11, 13, 14, 15, 6, 7, 9, 8,
    7, 6, 8, 13, 11, 9, 7, 15, 7, 12, 15, 9, 11, 7, 13, 12,
    11, 13, 6, 7, 14, 9, 13, 15, 14, 8, 13, 6, 5, 12, 7, 5,
    11, 12, 14, 15, 14, 15, 9, 8, 9, 14, 5, 6, 8, 6, 5, 12,
    9, 15, 5, 11, 6, 8, 13, 12, 5, 12, 13, 14, 11, 8, 5, 6)
  private val S2 = Array(
    8, 9, 9, 11, 13, 15, 15, 5, 7, 7, 8, 11, 14, 14, 12, 6,
    9, 13, 15, 7, 12, 8, 9, 11, 7, 7, 12, 7, 6, 15, 13, 11,
    9, 7, 15, 11, 8, 6, 6, 14, 12, 13, 5, 14, 13, 13, 7, 5,
    15, 5, 8, 11, 14, 14, 6, 14, 6, 9, 12, 9, 12, 5, 15, 8,
    8, 5, 12, 9, 12, 5, 14, 6, 8, 13, 6, 5, 15, 13, 11, 11)
  private val K1 = Array(0x00000000, 0x5A827999, 0x6ED9EBA1, 0x8F1BBCDC.toInt, 0xA953FD4E.toInt)
  private val K2 = Array(0x50A28BE6, 0x5C4DD124, 0x6D703EF3, 0x7A6D76E9, 0x00000000)

  @inline private def rotl(x: Int, n: Int): Int = Integer.rotateLeft(x, n)

  // the five boolean step functions; line 1 runs f(1..5), line 2 f(5..1)
  @inline private def f(round: Int, x: Int, y: Int, z: Int): Int =
    round match {
      case 0 => x ^ y ^ z
      case 1 => (x & y) | (~x & z)
      case 2 => (x | ~y) ^ z
      case 3 => (x & z) | (y & ~z)
      case _ => x ^ (y | ~z)
    }

  def hash(msg: Array[Byte]): Array[Byte] = {
    // MD-style padding: 0x80, zeros, 64-bit LITTLE-endian bit count
    val bitLen = msg.length.toLong * 8
    val padded = new Array[Byte](((msg.length + 8) / 64 + 1) * 64)
    System.arraycopy(msg, 0, padded, 0, msg.length)
    padded(msg.length) = 0x80.toByte
    var i = 0
    while (i < 8) {
      padded(padded.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xFF).toByte
      i += 1
    }
    var h0 = 0x67452301
    var h1 = 0xEFCDAB89.toInt
    var h2 = 0x98BADCFE.toInt
    var h3 = 0x10325476
    var h4 = 0xC3D2E1F0.toInt
    val x = new Array[Int](16)
    var off = 0
    while (off < padded.length) {
      var w = 0
      while (w < 16) {
        val b = off + 4 * w
        x(w) = (padded(b) & 0xFF) | ((padded(b + 1) & 0xFF) << 8) |
          ((padded(b + 2) & 0xFF) << 16) | ((padded(b + 3) & 0xFF) << 24)
        w += 1
      }
      var a1 = h0; var b1 = h1; var c1 = h2; var d1 = h3; var e1 = h4
      var a2 = h0; var b2 = h1; var c2 = h2; var d2 = h3; var e2 = h4
      var j = 0
      while (j < 80) {
        val rnd = j / 16
        var t = rotl(a1 + f(rnd, b1, c1, d1) + x(R1(j)) + K1(rnd), S1(j)) + e1
        a1 = e1; e1 = d1; d1 = rotl(c1, 10); c1 = b1; b1 = t
        t = rotl(a2 + f(4 - rnd, b2, c2, d2) + x(R2(j)) + K2(rnd), S2(j)) + e2
        a2 = e2; e2 = d2; d2 = rotl(c2, 10); c2 = b2; b2 = t
        j += 1
      }
      val t = h1 + c1 + d2
      h1 = h2 + d1 + e2
      h2 = h3 + e1 + a2
      h3 = h4 + a1 + b2
      h4 = h0 + b1 + c2
      h0 = t
      off += 64
    }
    val out = new Array[Byte](20)
    val hs = Array(h0, h1, h2, h3, h4)
    i = 0
    while (i < 20) {
      out(i) = ((hs(i / 4) >>> (8 * (i % 4))) & 0xFF).toByte
      i += 1
    }
    out
  }

  def hashUTF8(s: UTF8String): Array[Byte] = hash(s.getBytes)
}

/** `ripe_md160(string | binary)` → 20-byte binary. */
case class RipeMD160(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "ripe_md160"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ripe_md160 expects string or binary, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = child.dataType match {
    case StringType => RipeMD160Impl.hashUTF8(v.asInstanceOf[UTF8String])
    case _ => RipeMD160Impl.hash(v.asInstanceOf[Array[Byte]])
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.RipeMD160Impl.hashUTF8($v);"
      case _ =>
        s"${ev.value} = graft.functions.RipeMD160Impl.hash($v);"
    })
  override protected def withNewChildInternal(c: Expression): RipeMD160 =
    copy(child = c)
}
