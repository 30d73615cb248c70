package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType, StringType}
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

  @inline private def getLongLE(d: Array[Byte], i: Int): Long =
    (getIntLE(d, i) & 0xffffffffL) | ((getIntLE(d, i + 4) & 0xffffffffL) << 32)

  /** XXH64 (Collet's published xxHash, 64-bit variant) over raw bytes —
    * ClickHouse's `xxHash64(s)` is seed 0. Verified TWO ways in
    * HashesSpec: published vectors, and property-equality with Spark's
    * own `xxhash64` over BinaryType (which is XXH64 at seed 42 on the
    * raw bytes) — an independent in-JVM oracle for every length class.
    */
  def xxHash64(data: Array[Byte], seed: Long = 0L): Long = {
    val P1 = 0x9E3779B185EBCA87L; val P2 = 0xC2B2AE3D27D4EB4FL
    val P3 = 0x165667B19E3779F9L; val P4 = 0x85EBCA77C2B2AE63L
    val P5 = 0x27D4EB2F165667C5L
    val len = data.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2; var v2 = seed + P2
        var v3 = seed; var v4 = seed - P1
        while (i <= len - 32) {
          v1 = rotl(v1 + getLongLE(data, i) * P2, 31) * P1
          v2 = rotl(v2 + getLongLE(data, i + 8) * P2, 31) * P1
          v3 = rotl(v3 + getLongLE(data, i + 16) * P2, 31) * P1
          v4 = rotl(v4 + getLongLE(data, i + 24) * P2, 31) * P1
          i += 32
        }
        var x = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        @inline def merge(acc: Long, v: Long): Long =
          (acc ^ (rotl(v * P2, 31) * P1)) * P1 + P4
        x = merge(x, v1); x = merge(x, v2); x = merge(x, v3); merge(x, v4)
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ (rotl(getLongLE(data, i) * P2, 31) * P1), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ ((getIntLE(data, i) & 0xffffffffL) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((data(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  /** MurmurHash2-64A with an explicit seed. gcc libstdc++'s
    * `_Hash_bytes` (→ CH `gccMurmurHash`, seed 0xc70f6907) is this
    * exact core — its shift_mix(load·m)·m block step and
    * shift_mix/mul/shift_mix finalization are algebraically the
    * published 64A steps.
    */
  def murmur2_64(data: Array[Byte], seed: Long): Long = {
    val m = 0xc6a4a7935bd1e995L; val r = 47
    var h = seed ^ (data.length * m)
    var i = 0
    while (i + 8 <= data.length) {
      var k = getLongLE(data, i)
      k *= m; k ^= k >>> r; k *= m
      h ^= k; h *= m
      i += 8
    }
    var j = data.length - 1
    while (j >= i) { h ^= (data(j) & 0xffL) << (8 * (j - i)); j -= 1 }
    if (data.length % 8 != 0) h *= m
    h ^= h >>> r; h *= m; h ^= h >>> r
    h
  }

  /** MurmurHash2 (32-bit) with an explicit seed — Kafka's
    * DefaultPartitioner uses seed 0x9747b28c.
    */
  def murmur2_32(data: Array[Byte], seed: Int): Int = {
    val m = 0x5bd1e995; val r = 24
    var h = seed ^ data.length
    var i = 0
    while (i + 4 <= data.length) {
      var k = getIntLE(data, i)
      k *= m; k ^= k >>> r; k *= m
      h *= m; h ^= k
      i += 4
    }
    var j = data.length - 1
    while (j >= i) { h ^= (data(j) & 0xff) << (8 * (j - i)); j -= 1 }
    if (data.length % 4 != 0) h *= m
    h ^= h >>> 13; h *= m; h ^= h >>> 15
    h
  }

  /** MD4 (RFC 1320) — ClickHouse `MD4(s)`, 16 binary bytes. Pinned to
    * the RFC's own test-suite vectors in HashesSpec.
    */
  def md4(data: Array[Byte]): Array[Byte] = {
    val bitLen = data.length.toLong * 8
    val padded = new Array[Byte](((data.length + 8) / 64 + 1) * 64)
    System.arraycopy(data, 0, padded, 0, data.length)
    padded(data.length) = 0x80.toByte
    var i = 0
    while (i < 8) {
      padded(padded.length - 8 + i) = ((bitLen >>> (8 * i)) & 0xFF).toByte
      i += 1
    }
    var a0 = 0x67452301; var b0 = 0xefcdab89; var c0 = 0x98badcfe
    var d0 = 0x10325476
    val x = new Array[Int](16)
    val K2 = Array(0, 4, 8, 12, 1, 5, 9, 13, 2, 6, 10, 14, 3, 7, 11, 15)
    val K3 = Array(0, 8, 4, 12, 2, 10, 6, 14, 1, 9, 5, 13, 3, 11, 7, 15)
    val S1 = Array(3, 7, 11, 19); val S2 = Array(3, 5, 9, 13)
    val S3 = Array(3, 9, 11, 15)
    var off = 0
    while (off < padded.length) {
      var w = 0
      while (w < 16) { x(w) = getIntLE(padded, off + 4 * w); w += 1 }
      var a = a0; var b = b0; var c = c0; var d = d0
      var j = 0
      while (j < 16) {
        val t = rotl32(a + ((b & c) | (~b & d)) + x(j), S1(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      j = 0
      while (j < 16) {
        val t = rotl32(
          a + ((b & c) | (b & d) | (c & d)) + x(K2(j)) + 0x5a827999, S2(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      j = 0
      while (j < 16) {
        val t = rotl32(a + (b ^ c ^ d) + x(K3(j)) + 0x6ed9eba1, S3(j % 4))
        a = d; d = c; c = b; b = t
        j += 1
      }
      a0 += a; b0 += b; c0 += c; d0 += d
      off += 64
    }
    val out = new Array[Byte](16)
    val hs = Array(a0, b0, c0, d0)
    i = 0
    while (i < 16) {
      out(i) = ((hs(i / 4) >>> (8 * (i % 4))) & 0xFF).toByte
      i += 1
    }
    out
  }

  /** `javaHash` over the UTF-16LE reinterpretation of the bytes — CH
    * `javaHashUTF16LE` (requires an even byte count, like CH).
    */
  def javaHashUTF16LE(data: Array[Byte]): Int = {
    require(data.length % 2 == 0,
      "javaHashUTF16LE: input byte length must be even (UTF-16LE code units)")
    var h = 0
    var i = 0
    while (i < data.length) {
      h = 31 * h + ((data(i) & 0xff) | ((data(i + 1) & 0xff) << 8))
      i += 2
    }
    h
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

/** `xx_hash64(string|binary[, seed]) -> bigint` — XXH64 over raw bytes
  * (two's-complement view of CH's UInt64, like sip_hash64). The CH
  * spelling `xxHash64(s)` is the seed-0 form; the optional seed serves
  * graft-internal derived hash families (Text.hashPairsFast). NOTE:
  * after Graft.init the name `xxhash64` resolves HERE (Spark's
  * function API is name-resolved and case-insensitive), shadowing
  * Spark's typed-layout builtin — internal operators therefore call
  * this expression explicitly, never the builtin by name.
  */
case class XxHash64Ch(child: Expression, seed: Long = 0L)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "xx_hash64"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"xx_hash64 expects string or binary, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => CHash.xxHash64(s.getBytes, seed)
    case b: Array[Byte] => CHash.xxHash64(b, seed)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CHash.xxHash64($c.getBytes(), ${seed}L);"
      case _ =>
        s"${ev.value} = graft.functions.CHash.xxHash64($c, ${seed}L);"
    })
  override protected def withNewChildInternal(newChild: Expression): XxHash64Ch =
    copy(child = newChild)
}

object XxHash64Ch {
  /** Registry builder: 1-arg (seed 0) or a literal integer seed. */
  def build(children: Seq[Expression]): Expression = children match {
    case Seq(c) => XxHash64Ch(c)
    case Seq(c, org.apache.spark.sql.catalyst.expressions.Literal(s, t))
        if t == LongType || t == IntegerType =>
      XxHash64Ch(c, s.toString.toLong)
    case _ => throw new IllegalArgumentException(
      "xx_hash64(value[, literal integer seed])")
  }
}

/** `md4_hash(string|binary) -> binary(16)` — RFC 1320. */
case class Md4Hash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "md4_hash"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"md4_hash expects string or binary, got ${t.simpleString}")
  }
  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String => CHash.md4(s.getBytes)
    case b: Array[Byte] => CHash.md4(b)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => child.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CHash.md4($c.getBytes());"
      case _ =>
        s"${ev.value} = graft.functions.CHash.md4($c);"
    })
  override protected def withNewChildInternal(newChild: Expression): Md4Hash =
    copy(child = newChild)
}

/** `sip_hash64_keyed(k0, k1, string|binary) -> bigint` — the keyed
  * SipHash-2-4 (CH sipHash64Keyed((k0, k1), s); the dialect unpacks
  * the key tuple). Same core as [[SipHash64]], keys passed through.
  */
case class SipHash64Keyed(first: Expression, second: Expression,
                          third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sip_hash64_keyed"
  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == LongType && second.dataType == LongType &&
        (third.dataType == StringType || third.dataType == BinaryType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sip_hash64_keyed expects (bigint k0, bigint k1, string|binary)")
  override def nullSafeEval(k0: Any, k1: Any, v: Any): Any = v match {
    case s: UTF8String =>
      CHash.sipHash64(s.getBytes, k0.asInstanceOf[Long], k1.asInstanceOf[Long])
    case b: Array[Byte] =>
      CHash.sipHash64(b, k0.asInstanceOf[Long], k1.asInstanceOf[Long])
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (k0, k1, c) => third.dataType match {
      case StringType =>
        s"${ev.value} = graft.functions.CHash.sipHash64($c.getBytes(), $k0, $k1);"
      case _ =>
        s"${ev.value} = graft.functions.CHash.sipHash64($c, $k0, $k1);"
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SipHash64Keyed =
    copy(first = f, second = s, third = t)
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
