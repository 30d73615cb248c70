package graft

import graft.functions.Sqids
import org.scalatest.funsuite.AnyFunSuite

/** Sqids codec pinned to the PUBLISHED sqids-spec test vectors
  * (sqids.org reference tests): simple encode, incremental single
  * numbers, incremental pairs, minLength padding, custom-blocklist
  * re-generation (the offset+increment re-shuffle path), and u64
  * round-trips. Plus the Graft.sql spellings (`sqid`, `sqidEncode`,
  * `sqidDecode`) under codegen.fallback=false.
  */
class SqidsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("published vector: encode [1,2,3] = 86Rf07 and back") {
    assert(Sqids.encode(Seq(1L, 2L, 3L)) == "86Rf07")
    assert(Sqids.decode("86Rf07") == Seq(1L, 2L, 3L))
  }

  test("published vectors: incremental single numbers") {
    val want = Seq("bM" -> 0L, "Uk" -> 1L, "gb" -> 2L, "Ef" -> 3L,
      "Vq" -> 4L, "uw" -> 5L, "OI" -> 6L, "AX" -> 7L, "p6" -> 8L,
      "nJ" -> 9L)
    want.foreach { case (id, n) =>
      assert(Sqids.encode(Seq(n)) == id, s"encode($n)")
      assert(Sqids.decode(id) == Seq(n), s"decode($id)")
    }
  }

  test("published vectors: incremental [0, k] pairs") {
    val want = Seq("SvIz" -> 0L, "n3qa" -> 1L, "tryF" -> 2L,
      "eg6q" -> 3L, "rSCF" -> 4L, "sR8x" -> 5L, "uY2M" -> 6L,
      "74dI" -> 7L, "30WX" -> 8L, "moxr" -> 9L)
    want.foreach { case (id, k) =>
      assert(Sqids.encode(Seq(0L, k)) == id, s"encode([0,$k])")
      assert(Sqids.decode(id) == Seq(0L, k), s"decode($id)")
    }
  }

  test("published vector: minLength = alphabet length pads to 62") {
    val id = Sqids.encode(Seq(1L, 2L, 3L), minLength = Sqids.DefaultAlphabet.length)
    assert(id ==
      "86Rf07xd4zBmiJXQG6otHEbew02c3PWsUOLZxADhCpKj7aVFv9I8RquYrNlSTM")
    assert(Sqids.decode(id) == Seq(1L, 2L, 3L))
    // padding changes the ID, not the decoded numbers
    for (ml <- Seq(0, 1, 5, 10, 33)) {
      val p = Sqids.encode(Seq(1L, 2L, 3L), minLength = ml)
      assert(p.length >= ml && Sqids.decode(p) == Seq(1L, 2L, 3L))
    }
  }

  test("published vectors: blocklist re-generation path") {
    // no blocklist: the canonical encoding of 4572721 IS 'aho1e'
    assert(Sqids.encode(Seq(4572721L)) == "aho1e")
    assert(Sqids.decode("aho1e") == Seq(4572721L))
    // a custom blocklist replaces (not extends) the default: 'aho1e'
    // passes, 'ArUO' (the canonical encoding of 100000) re-generates
    val bl = Seq("ArUO")
    assert(Sqids.encode(Seq(4572721L), blocklist = bl) == "aho1e")
    assert(Sqids.decode("ArUO") == Seq(100000L))
    assert(Sqids.encode(Seq(100000L), blocklist = bl) == "QyG4")
    assert(Sqids.decode("QyG4") == Seq(100000L))
    // re-generated IDs still round-trip
    assert(Sqids.decode(Sqids.encode(Seq(100000L), blocklist = bl)) ==
      Seq(100000L))
  }

  test("blocklist matching rules: short exact, digit affix, substring") {
    // word with digits blocks by prefix/suffix, plain word by substring,
    // ≤3-char ids only by exact match — exercised via encode loops
    val numbers = Seq(1L, 2L, 3L) // canonical '86Rf07'
    val exact = Sqids.encode(numbers, blocklist = Seq("86Rf07"))
    assert(exact != "86Rf07" && Sqids.decode(exact) == numbers)
    val digitPrefix = Sqids.encode(numbers, blocklist = Seq("86rf"))
    assert(digitPrefix != "86Rf07" && Sqids.decode(digitPrefix) == numbers)
    // a substring WITHOUT digits anywhere in the id blocks too
    val mid = Sqids.encode(numbers, blocklist = Seq("rf0"))
    assert(Sqids.decode(mid) == numbers)
    // filtered out in the constructor: <3 chars and out-of-alphabet
    assert(Sqids.encode(numbers, blocklist = Seq("86", "é!?")) == "86Rf07")
  }

  test("u64 domain: unsigned round-trips incl. Long.MinValue and -1") {
    val vals = Seq(0L, 1L, 255L, 4096L, Int.MaxValue.toLong,
      Long.MaxValue, Long.MinValue, -1L, -42L)
    vals.foreach { v =>
      assert(Sqids.decode(Sqids.encode(Seq(v))) == Seq(v), s"round-trip $v")
    }
    // multi-number round-trips
    assert(Sqids.decode(Sqids.encode(vals)) == vals)
    for (i <- 0L until 100L) {
      val s = Seq(i, i * 31L + 7L)
      assert(Sqids.decode(Sqids.encode(s)) == s)
    }
  }

  test("lenient decode: empty, foreign chars, custom alphabet refusals") {
    assert(Sqids.decode("") == Seq())
    assert(Sqids.decode("*") == Seq())
    assert(Sqids.decode("86Rf07 ") == Seq()) // space not in alphabet
    intercept[IllegalArgumentException](Sqids.encode(Seq(1L), alphabet = "ab"))
    intercept[IllegalArgumentException](Sqids.encode(Seq(1L), alphabet = "aba"))
    intercept[IllegalArgumentException](Sqids.encode(Seq(1L), alphabet = "é€∂"))
  }

  test("Graft.sql spellings under codegen.fallback=false") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try {
      val r = Graft.sql(spark,
        """SELECT sqid(1, 2, 3) AS a, sqidEncode(4572721) AS b,
          |       sqidDecode('86Rf07') AS c, sqid(CAST(NULL AS BIGINT)) AS d
          |""".stripMargin).collect()(0)
      assert(r.getString(0) == "86Rf07")
      assert(r.getString(1) == "aho1e")
      assert(r.getSeq[Long](2) == Seq(1L, 2L, 3L))
      assert(r.isNullAt(3))
    } finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }
}
