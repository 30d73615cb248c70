package graft

import graft.functions.{CHash, GraftFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the ClickHouse bit-parity hashes: the
  * SipHash-2-4 reference test vectors published with the algorithm
  * (key bytes 00..0f, message = first n bytes of 00,01,02,…), plus
  * the worked example from the paper's appendix (15-byte message →
  * 0xa129ca6149be45e5, which exercises the full-block path). intHash64
  * is pinned by the fmix64 algebra (0 → 0, bijective on samples) and
  * interpreted-vs-codegen agreement.
  */
class HashesSpec extends AnyFunSuite {

  private val k0 = 0x0706050403020100L
  private val k1 = 0x0f0e0d0c0b0a0908L
  private def msg(n: Int): Array[Byte] = Array.tabulate(n)(_.toByte)

  test("sipHash64 matches the published SipHash-2-4 test vectors") {
    val expected = Seq( // vectors_sip64[0..7]: message lengths 0..7
      0x726fdb47dd0e0e31L, 0x74f839c593dc67fdL, 0x0d6c8009d9a94f5aL,
      0x85676696d7fb7e2dL, 0xcf2794e0277187b7L, 0x18765564cd99a68dL,
      0xcbc9466e58fee3ceL, 0xab0200f58b01d137L)
    expected.zipWithIndex.foreach { case (want, n) =>
      assert(CHash.sipHash64(msg(n), k0, k1) == want, s"len=$n")
    }
    // the paper's Appendix A worked example: 15-byte message
    assert(CHash.sipHash64(msg(15), k0, k1) == 0xa129ca6149be45e5L)
  }

  test("intHash64 is the fmix64 mixer: 0 fixed point, injective on samples") {
    assert(CHash.intHash64(0L) == 0L)
    val xs = (0L until 10000L) ++ Seq(Long.MaxValue, Long.MinValue, -1L)
    assert(xs.map(CHash.intHash64).distinct.size == xs.size)
  }

  test("sip_hash64/int_hash64 expressions agree with CHash through codegen") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(("", 0L), ("a", 1L), ("graft", 42L),
      ("The quick brown fox jumps over the lazy dog", -7L))
      .toDF("s", "x")
      .selectExpr("s", "x", "sip_hash64(s) AS hs", "int_hash64(x) AS hx")
      .collect()
    rows.foreach { r =>
      assert(r.getLong(2) ==
        CHash.sipHash64(r.getString(0).getBytes("UTF-8")), r.getString(0))
      assert(r.getLong(3) == CHash.intHash64(r.getLong(1)))
    }
  }

  test("sip_hash64 accepts binary input and matches string input bytes") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq("payload").toDF("s")
      .selectExpr("sip_hash64(s) AS a", "sip_hash64(CAST(s AS BINARY)) AS b")
      .as[(Long, Long)].head()
    assert(r._1 == r._2)
  }

  test("xxHash32 matches published XXH32 reference vectors (seed 0)") {
    // vectors cross-checked against the published algorithm this round
    assert(CHash.xxHash32("".getBytes("UTF-8")) == 0x02cc5d05L)
    assert(CHash.xxHash32("abc".getBytes("UTF-8")) == 0x32d153ffL)
    assert(CHash.xxHash32("1234567890123456xyz".getBytes("UTF-8")) == 0x99f40a77L)
    assert(CHash.xxHash32("hello world".getBytes("UTF-8")) == 0xcebb6622L)
    val spark = TestSpark.spark
    Graft.init(spark, "/root/testdata/sf0.001")
    val r = Graft.sql(spark, "SELECT xxHash32('abc') AS h").head()
    assert(r.getLong(0) == 0x32d153ffL)
  }

  test("negative: the SipHash vectors bite — any single-bit drift breaks them") {
    // scalar_ch_hashes is an allowlisted rows-only gate entry: these
    // vectors ARE its correctness check, so prove they discriminate —
    // a one-bit change in key, message, or length must miss the pinned
    // answer (if the implementation ever drifts, the positive test
    // above goes red rather than silently passing).
    val want = 0xa129ca6149be45e5L
    assert(CHash.sipHash64(msg(15), k0 ^ 1L, k1) != want)
    assert(CHash.sipHash64(msg(15), k0, k1 ^ (1L << 63)) != want)
    val m = msg(15); m(14) = (m(14) ^ 1).toByte
    assert(CHash.sipHash64(m, k0, k1) != want)
    assert(CHash.sipHash64(msg(14), k0, k1) != want)
    assert(CHash.xxHash32("abd".getBytes("UTF-8")) != 0x32d153ffL)
  }

  test("r19: XXH64 — published vectors AND Spark's own XXH64-on-binary as oracle") {
    // published single-value pins (seed 0)
    assert(CHash.xxHash64(Array.emptyByteArray) == 0xEF46DB3751D8E999L)
    // Spark's xxhash64 over BinaryType IS XXH64(bytes, seed=42) — an
    // independent in-JVM oracle covering every length class (empty,
    // <4, <8, 8..31, >=32, multi-stripe) and the tail permutations
    val rnd = new scala.util.Random(19)
    for (len <- (0 to 40) ++ Seq(63, 64, 65, 100, 1000)) {
      val bytes = new Array[Byte](len)
      rnd.nextBytes(bytes)
      val spark42 = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          len, 42L)
      assert(CHash.xxHash64(bytes, 42L) == spark42, s"len $len vs Spark XXH64")
    }
  }

  test("r19: MD4 — the RFC 1320 test suite, all seven vectors") {
    def hx(s: String): String =
      CHash.md4(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hx("") == "31d6cfe0d16ae931b73c59d7e0c089c0")
    assert(hx("a") == "bde52cb31de33e46245e05fbdbd6fb24")
    assert(hx("abc") == "a448017aaf21d8525fc10ae87aa6729d")
    assert(hx("message digest") == "d9130a8164549fe818874806e1c7014b")
    assert(hx("abcdefghijklmnopqrstuvwxyz") ==
      "d79e1c308aa5bbcdeea8ed63df412da9")
    assert(hx("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789") ==
      "043f8582f241db351ce627e153e7f0e4")
    assert(hx("1234567890123456789012345678901234567890" +
      "1234567890123456789012345678901234567890") ==
      "e33b4ddc9c38f2199c3e7b164fcc0536")
  }

  test("r19: keyed SipHash — zero key == sipHash64, paper vector bound") {
    val data = "shard-routing-key".getBytes("UTF-8")
    assert(CHash.sipHash64(data, 0L, 0L) == CHash.sipHash64(data))
    // the canonical SipHash-2-4 paper vector IS the keyed form (the
    // positive pin above); spot-check key sensitivity
    assert(CHash.sipHash64(data, 1L, 0L) != CHash.sipHash64(data))
  }

  test("r19: javaHashUTF16LE decodes LE code units ('test' == 3556498, the CH-doc value)") {
    // 't\0e\0s\0t\0' utf-8-encodes to exactly the utf-16le bytes
    val le = "t\u0000e\u0000s\u0000t\u0000".getBytes("UTF-8")
    assert(CHash.javaHashUTF16LE(le) == 3556498)
    assert("test".hashCode == 3556498)
    intercept[IllegalArgumentException](CHash.javaHashUTF16LE(Array[Byte](1)))
  }

  test("r19: gcc/kafka murmur seeds — stability pins + seed discrimination") {
    // STABILITY pins (same class as the murmurHash2 family's: the
    // algorithms are public and seeded per gcc _Hash_bytes / Kafka's
    // DefaultPartitioner, no independent JVM oracle exists here)
    val b = "ClickHouse".getBytes("UTF-8")
    assert(CHash.murmur2_64(b, 0xc70f6907L) == 8420095868926061731L)
    assert((CHash.murmur2_32(b, 0x9747b28c) & 0x7fffffff) == 910462517)
    // the seeded entry points at seed 0 must stay the registered
    // murmurHash2 family's values (one shared core, two entry points)
    assert(CHash.murmur2_64(b, 0L) != CHash.murmur2_64(b, 0xc70f6907L))
  }
}
