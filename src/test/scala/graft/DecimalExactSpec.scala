package graft

import org.scalatest.funsuite.AnyFunSuite

/** DecimalExactArith (divideDecimal/multiplyDecimal with an explicit
  * result scale) — the round-15 replacement for the SQL-macro spelling
  * that silently lost precision past scale 6 (Spark's
  * allowPrecisionLoss rule caps the (38,18)/(38,18) quotient's scale
  * at 6; ADVICE r14, medium). Known answers at scale > 6 are the
  * regression the old macro failed.
  */
class DecimalExactSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def one(sql: String): String = {
    Graft.init(spark, "/root/testdata/sf0.001")
    Graft.sql(spark, sql).collect().head.getString(0)
  }

  test("divideDecimal survives result_scale > 6 (the old macro's silent loss)") {
    // old macro: round(CAST/CAST, 10) -> DECIMAL(38,6) intermediate ->
    // 0.333333 instead of 0.3333333333
    assert(one("SELECT toString(divideDecimal(toDecimal64(1.0, 1), toDecimal64(3.0, 1), 10)) AS x")
      == "0.3333333333")
    // HALF_UP at the requested scale
    assert(one("SELECT toString(divideDecimal(toDecimal64(2.0, 1), toDecimal64(3.0, 1), 10)) AS x")
      == "0.6666666667")
    // scale 4 known answers unchanged from the wave-36 behavior
    assert(one("SELECT toString(divideDecimal(toDecimal64(10.5, 2), toDecimal64(2.0, 2), 4)) AS x")
      == "5.2500")
  }

  test("multiplyDecimal survives result_scale > 6 (1e-4 * 1e-4 = 1e-8, not 0)") {
    assert(one("SELECT toString(multiplyDecimal(toDecimal64(0.0001, 4), toDecimal64(0.0001, 4), 8)) AS x")
      == "0.00000001")
    assert(one("SELECT toString(multiplyDecimal(toDecimal64(1.5, 2), toDecimal64(2.5, 2), 3)) AS x")
      == "3.750")
  }

  test("division by zero and overflow refuse loudly (CH contract)") {
    val e1 = intercept[Exception](
      one("SELECT toString(divideDecimal(toDecimal64(1.0, 1), toDecimal64(0.0, 1), 4)) AS x"))
    assert(serr(e1).contains("division by zero"), serr(e1))
    // 10^20 * 10^20 = 10^40: 41 integer digits can never fit DECIMAL(38,_)
    val e2 = intercept[Exception](
      one("SELECT toString(multiplyDecimal(CAST('100000000000000000000' AS DECIMAL(38,0))," +
        " CAST('100000000000000000000' AS DECIMAL(38,0)), 0)) AS x"))
    assert(serr(e2).contains("overflows"), serr(e2))
  }

  test("result_scale must be a constant integer in [0, 38]") {
    val e = intercept[Exception](
      one("SELECT toString(divideDecimal(toDecimal64(1.0, 1), toDecimal64(3.0, 1), 99)) AS x"))
    assert(serr(e).contains("[0, 38]"), serr(e))
    val e2 = intercept[Exception](
      one("SELECT toString(divideDecimal(toDecimal64(1.0, 1), toDecimal64(2.0, 1))) AS x"))
    assert(serr(e2).contains("result_scale"), serr(e2))
  }

  /** walk the cause chain — analysis wraps builder exceptions */
  private def serr(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
}
