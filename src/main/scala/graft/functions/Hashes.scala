package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** ClickHouse bit-parity hash functions (SURVEY §2.8 hash family):
  * `sipHash64` (SipHash-2-4 with a zero key, per the published
  * algorithm of Aumasson & Bernstein, "SipHash: a fast short-input
  * PRF") and `intHash64` (the 64-bit avalanche mixer — the
  * MurmurHash3 fmix64 finalizer). These matter when hash values
  * themselves are data — sampling keys, shard routing, pre-computed
  * fingerprints — and must agree with values a ClickHouse deployment
  * already wrote. Both are native expressions: `intHash64` inlines
  * into whole-stage codegen; `sipHash64` compiles to a static call
  * (the same shape Spark's own xxhash64 uses), so neither breaks the
  * codegen stage.
  */
object CHash {

  @inline private def rotl(x: Long, b: Int): Long = (x << b) | (x >>> (64 - b))

  /** SipHash-2-4 over `data` with a 128-bit key (k0, k1). */
  def sipHash64(data: Array[Byte], k0: Long, k1: Long): Long = {
    var v0 = 0x736f6d6570736575L ^ k0
    var v1 = 0x646f72616e646f6dL ^ k1
    var v2 = 0x6c7967656e657261L ^ k0
    var v3 = 0x7465646279746573L ^ k1

    @inline def sipRound(): Unit = {
      v0 += v1; v1 = rotl(v1, 13); v1 ^= v0; v0 = rotl(v0, 32)
      v2 += v3; v3 = rotl(v3, 16); v3 ^= v2
      v0 += v3; v3 = rotl(v3, 21); v3 ^= v0
      v2 += v1; v1 = rotl(v1, 17); v1 ^= v2; v2 = rotl(v2, 32)
    }

    val len = data.length
    val end = len - (len % 8)
    var i = 0
    while (i < end) {
      var m = 0L
      var j = 7
      while (j >= 0) { m = (m << 8) | (data(i + j) & 0xffL); j -= 1 }
      v3 ^= m; sipRound(); sipRound(); v0 ^= m
      i += 8
    }
    var b = len.toLong << 56
    var j = len - 1
    while (j >= end) { b |= (data(j) & 0xffL) << (8 * (j - end)); j -= 1 }
    v3 ^= b; sipRound(); sipRound(); v0 ^= b
    v2 ^= 0xffL
    sipRound(); sipRound(); sipRound(); sipRound()
    v0 ^ v1 ^ v2 ^ v3
  }

  /** Zero-key SipHash-2-4 — ClickHouse's `sipHash64(s)`. */
  def sipHash64(data: Array[Byte]): Long = sipHash64(data, 0L, 0L)

  @inline private def rotl32(x: Int, b: Int): Int = (x << b) | (x >>> (32 - b))
  @inline private def getIntLE(d: Array[Byte], i: Int): Int =
    (d(i) & 0xff) | ((d(i + 1) & 0xff) << 8) |
      ((d(i + 2) & 0xff) << 16) | ((d(i + 3) & 0xff) << 24)

  /** XXH32 (Collet's published xxHash, 32-bit variant) — ClickHouse's
    * `xxHash32(s)` with seed 0. Returned as the UNSIGNED value in a
    * Long (CH's UInt32 view). Pinned against published vectors in
    * HashesSpec (xxh32("abc") = 0x32D153FF, xxh32("") = 0x02CC5D05).
    */
  def xxHash32(data: Array[Byte], seed: Int = 0): Long = {
    val P1 = 0x9e3779b1; val P2 = 0x85ebca77; val P3 = 0xc2b2ae3d
    val P4 = 0x27d4eb2f; val P5 = 0x165667b1
    val len = data.length
    var i = 0
    var h =
      if (len >= 16) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i <= len - 16) {
          v1 = rotl32(v1 + getIntLE(data, i) * P2, 13) * P1
          v2 = rotl32(v2 + getIntLE(data, i + 4) * P2, 13) * P1
          v3 = rotl32(v3 + getIntLE(data, i + 8) * P2, 13) * P1
          v4 = rotl32(v4 + getIntLE(data, i + 12) * P2, 13) * P1
          i += 16
        }
        rotl32(v1, 1) + rotl32(v2, 7) + rotl32(v3, 12) + rotl32(v4, 18)
      } else seed + P5
    h += len
    while (i + 4 <= len) { h = rotl32(h + getIntLE(data, i) * P3, 17) * P4; i += 4 }
    while (i < len) { h = rotl32(h + (data(i) & 0xff) * P5, 11) * P1; i += 1 }
    h ^= h >>> 15; h *= P2; h ^= h >>> 13; h *= P3; h ^= h >>> 16
    h & 0xffffffffL
  }

  /** 64-bit avalanche mixer — ClickHouse's `intHash64(x)`. */
  def intHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }
}

/** `sip_hash64(string|binary) -> bigint` (two's-complement view of the
  * unsigned 64-bit SipHash-2-4 value, zero key).
  */
case class SipHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sip_hash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sip_hash64 expects string or binary, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => CHash.sipHash64(s.getBytes)
    case b: Array[Byte] => CHash.sipHash64(b)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CHash.sipHash64($c.getBytes());"
      case _ =>
        s"${ev.value} = graft.functions.CHash.sipHash64($c);"
    })
  override protected def withNewChildInternal(newChild: Expression): SipHash64 =
    copy(child = newChild)
}

/** `xx_hash32(string|binary) -> bigint` — XXH32 seed 0, unsigned view
  * (ClickHouse returns UInt32; a Long carries 0..2^32-1 losslessly).
  */
case class XxHash32Ch(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "xx_hash32"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"xx_hash32 expects string or binary, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => CHash.xxHash32(s.getBytes)
    case b: Array[Byte] => CHash.xxHash32(b)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CHash.xxHash32($c.getBytes(), 0);"
      case _ =>
        s"${ev.value} = graft.functions.CHash.xxHash32($c, 0);"
    })
  override protected def withNewChildInternal(newChild: Expression): XxHash32Ch =
    copy(child = newChild)
}

/** `int_hash64(bigint) -> bigint` — inlined avalanche mixer. */
case class IntHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "int_hash64"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int_hash64 expects bigint, got ${child.dataType.simpleString}")
  override def nullSafeEval(v: Any): Any =
    CHash.intHash64(v.asInstanceOf[Long])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long x = $c;
         |x ^= x >>> 33; x *= 0xff51afd7ed558ccdL;
         |x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L;
         |x ^= x >>> 33;
         |${ev.value} = x;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): IntHash64 =
    copy(child = newChild)
}
