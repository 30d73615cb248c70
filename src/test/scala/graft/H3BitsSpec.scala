package graft

import graft.functions.{GraftFunctions, H3Bits}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** H3 index bit-algebra against the published H3 documentation
  * examples: the canonical res-9 index 8928308280fffff (resolution 9,
  * base cell 20, parent 8828308281fffff), the res-0 pentagon
  * 8009fffffffffff, plus the structural invariants (children round
  * back to parent, 7^k fan-out for hexagons, 6·7^(k−1)+… for
  * pentagons via the deleted K subsequence, hex codec round-trip).
  */
class H3BitsSpec extends AnyFunSuite {

  private def h(s: String): Long = H3Bits.fromHexString(UTF8String.fromString(s))

  private val sf9 = h("8928308280fffff") // the canonical docs index
  private val pent0 = h("8009fffffffffff") // res-0 pentagon (base cell 4)

  test("published vectors: resolution, base cell, parent, flags") {
    assert(H3Bits.resolution(sf9) == 9)
    assert(H3Bits.baseCell(sf9) == 20)
    assert(H3Bits.isValid(sf9))
    assert(!H3Bits.isPentagon(sf9))
    assert(H3Bits.isResClassIII(sf9)) // res 9 is odd
    assert(H3Bits.toHexString(H3Bits.toParent(sf9, 8)).toString == "8828308281fffff")
    assert(H3Bits.resolution(pent0) == 0)
    assert(H3Bits.baseCell(pent0) == 4)
    assert(H3Bits.isValid(pent0))
    assert(H3Bits.isPentagon(pent0))
    assert(!H3Bits.isResClassIII(pent0))
  }

  test("hex codec round-trips and rejects junk") {
    for (s <- Seq("8928308280fffff", "8009fffffffffff", "8828308281fffff")) {
      assert(H3Bits.toHexString(h(s)).toString == s)
    }
    intercept[IllegalArgumentException](h("not-hex"))
    intercept[IllegalArgumentException](h(""))
    intercept[IllegalArgumentException](h("8928308280fffff00")) // 17 chars
  }

  test("validity: each layout rule bites") {
    assert(!H3Bits.isValid(-1L)) // bit 63 set
    assert(!H3Bits.isValid(sf9 & ~(1L << 59))) // mode 0
    assert(!H3Bits.isValid(sf9 | (1L << 56))) // reserved bits
    assert(!H3Bits.isValid(sf9 | (127L << 45))) // base cell 127 > 121
    // a used digit of 7: set digit 9 (bits 18–20) of the res-9 index to 7
    assert(!H3Bits.isValid(sf9 | (7L << 18)))
    // an unused digit not 7: clear digit 10 (bits 15–17)
    assert(!H3Bits.isValid(sf9 & ~(7L << 15)))
    // pentagon deleted-K rule: first nonzero digit 1 under base cell 4
    val badPent = H3Bits.toCenterChild(pent0, 2) | (1L << (3 * 14)) // digit 1 = 1
    assert(!H3Bits.isValid(badPent))
    val okPent = H3Bits.toCenterChild(pent0, 2) | (2L << (3 * 14)) // digit 1 = 2
    assert(H3Bits.isValid(okPent))
    // …and once a nonzero digit appeared, 1 is allowed again
    val okPent2 = okPent & ~(7L << (3 * 13)) | (1L << (3 * 13)) // digit 2 = 1
    assert(H3Bits.isValid(okPent2))
  }

  test("parent/center-child/children algebra") {
    // parent is idempotent at own res and monotone in containment:
    assert(H3Bits.toParent(sf9, 9) == sf9)
    val p5 = H3Bits.toParent(sf9, 5)
    assert(H3Bits.resolution(p5) == 5 && H3Bits.isValid(p5))
    assert(H3Bits.toParent(sf9, 5) == H3Bits.toParent(H3Bits.toParent(sf9, 7), 5))
    // center child round-trips
    val cc = H3Bits.toCenterChild(sf9, 12)
    assert(H3Bits.resolution(cc) == 12 && H3Bits.isValid(cc))
    assert(H3Bits.toParent(cc, 9) == sf9)
    // children: hexagon fan-out is exactly 7^k, all valid, all distinct,
    // all parent back, and the center child is among them
    val kids = H3Bits.toChildren(sf9, 11)
    assert(kids.length == 49)
    assert(kids.distinct.length == 49)
    assert(kids.forall(k => H3Bits.isValid(k) && H3Bits.toParent(k, 9) == sf9))
    assert(kids.contains(H3Bits.toCenterChild(sf9, 11)))
    // pentagon: deleted K subsequence → 6 children at +1, 6·7 − 1 at +2
    val pk1 = H3Bits.toChildren(pent0, 1)
    assert(pk1.length == 6)
    assert(pk1.forall(k => H3Bits.isValid(k) && H3Bits.toParent(k, 0) == pent0))
    val pk2 = H3Bits.toChildren(pent0, 2)
    assert(pk2.length == 41) // 1 (center path) ×6 skips... = 6·7 − 1
    assert(pk2.forall(H3Bits.isValid))
    // the loud cap bites
    val e = intercept[IllegalArgumentException](H3Bits.toChildren(pent0, 9))
    assert(e.getMessage.contains("loud cap"))
    // resolution range checks bite
    intercept[IllegalArgumentException](H3Bits.toParent(sf9, 10))
    intercept[IllegalArgumentException](H3Bits.toCenterChild(sf9, 8))
  }

  test("h3 expressions run through codegen end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq("8928308280fffff").toDF("s")
      .selectExpr(
        "h3_get_resolution(string_to_h3(s)) AS res",
        "h3_get_base_cell(string_to_h3(s)) AS base",
        "h3_is_valid(string_to_h3(s)) AS ok",
        "h3_to_string(h3_to_parent(string_to_h3(s), 8)) AS p8",
        "size(h3_to_children(string_to_h3(s), 10)) AS nkids",
        "h3_is_res_class_iii(string_to_h3(s)) AS c3",
        "h3_is_pentagon(string_to_h3(s)) AS pent")
      .as[(Int, Int, Boolean, String, Int, Boolean, Boolean)].head()
    assert(r == ((9, 20, true, "8828308281fffff", 7, true, false)))
  }
}
