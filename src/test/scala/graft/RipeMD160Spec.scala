package graft

import graft.functions.RipeMD160Impl
import org.scalatest.funsuite.AnyFunSuite

/** RIPEMD-160 pinned to the OFFICIAL spec test vectors
  * (Dobbertin/Bosselaers/Preneel appendix; the quick-brown-fox value
  * is the ClickHouse docs example for ripeMD160). Any transcription
  * error in the selection/rotation tables fails every one of these —
  * the vectors are the arbiter, not the transcription.
  */
class RipeMD160Spec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def hex(s: String): String =
    RipeMD160Impl.hash(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("official spec vectors") {
    assert(hex("") == "9c1185a5c5e9fc54612808977ee8f548b2258d31")
    assert(hex("a") == "0bdc9d2d256b3ee9daae347be6f4dc835a467ffe")
    assert(hex("abc") == "8eb208f7e05d987a9b044a8e98c6b087f15a0bfc")
    assert(hex("message digest") == "5d0689ef49d2fae572b881b123a85ffa21595f36")
    assert(hex("abcdefghijklmnopqrstuvwxyz") ==
      "f71c27109c692c1b56bbdceb5b9d2865b3708dbc")
    assert(hex("abcdbcdecdefdefgefghfghighijhijkijkljklmklmnlmnomnopnopq") ==
      "12a053384a9c0c88e405a06c27dcf49ada62eb2b")
    assert(hex("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789") ==
      "b0e20b6e3116640286ed3a87a5713079b21f5189")
    // the CH docs example
    assert(hex("The quick brown fox jumps over the lazy dog") ==
      "37f332f68db77bd9d7edd4969571ad671cf9dd3b")
    // million 'a' (the spec's bulk vector) — also exercises multi-block
    val m = RipeMD160Impl.hash(Array.fill[Byte](1000000)('a'.toByte))
      .map("%02x".format(_)).mkString
    assert(m == "52783243c1697bdbe16d37f97f68f08325dc1528")
  }

  test("Graft.sql spelling under codegen.fallback=false, vs the CH docs example") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Graft.sql(spark,
        """SELECT hex(ripeMD160('The quick brown fox jumps over the lazy dog')) AS h,
          |       length(ripeMD160('')) AS n,
          |       ripeMD160(CAST(NULL AS STRING)) IS NULL AS z
          |""".stripMargin).collect()(0)
      assert(r.getString(0) == "37F332F68DB77BD9D7EDD4969571AD671CF9DD3B")
      assert(r.getInt(1) == 20) // session `length` = bytes (binary → int)
      assert(r.getBoolean(2))
    } finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }
}
