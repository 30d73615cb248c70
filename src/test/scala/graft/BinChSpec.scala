package graft

import org.apache.spark.sql.functions.expr
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for the CH-semantics `bin` (BinCh), now the live
  * implementation behind `Graft.sql`'s `bin` spelling: strings emit
  * one 8-bit group per UTF-8 byte; numerics print their declared
  * type's full width and are NEVER stringified (bits of 13, not of
  * "13"). [ClickHouse docs: sql-reference/functions/encoding-functions#bin]
  */
class BinChSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def one(sql: String): String = {
    Graft.init(spark, "/root/testdata/sf0.001")
    Graft.sql(spark, s"SELECT $sql AS r").head().getString(0)
  }

  test("string input: one 8-bit group per UTF-8 byte") {
    assert(one("bin('ab')") == "0110000101100010")
    assert(one("bin('0')") == "00110000")
    // multibyte: é = 0xC3 0xA9 in UTF-8
    assert(one("bin('é')") == "1100001110101001")
  }

  test("numeric input dispatches on type width, not string bytes") {
    assert(one("bin(5)") == "0" * 29 + "101")                  // INT → 32 bits
    assert(one("bin(CAST(5 AS BIGINT))") == "0" * 61 + "101")  // 64 bits
    assert(one("bin(CAST(5 AS TINYINT))") == "00000101")       // 8 bits
    assert(one("bin(CAST(5 AS SMALLINT))") == "0000000000000101")
    // negative values print two's-complement at the type width
    assert(one("bin(CAST(-1 AS TINYINT))") == "11111111")
    assert(one("bin(-1)") == "1" * 32)
  }

  test("unbin(bin(s)) round-trips strings") {
    assert(one("unbin(bin('abc'))") == "abc")
  }

  test("non-integral non-string input is rejected at analysis") {
    val e = intercept[Exception](one("bin(1.5)"))
    assert(e.getMessage.contains("bin expects"))
  }
}
