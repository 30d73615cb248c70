package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Coverage for the approx/sampling rows that can't hash-match a
  * DuckDB oracle (SURVEY §2.4 uniq/HLL, quantile sketches; §2.2
  * SAMPLE): tolerance and determinism checks instead.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct (HLL++) lands within 5% of uniqExact") {
    val li = Tables(spark, dir, "lineitem")
    val Array(exact, approx) = li.agg(
      countDistinct($"l_partkey").cast("double"),
      approx_count_distinct($"l_partkey", 0.02).cast("double"))
      .as[(Double, Double)].head() match { case (e, a) => Array(e, a) }
    assert(math.abs(approx - exact) / exact < 0.05, s"exact=$exact approx=$approx")
  }

  test("approx_percentile (GK) lands within 2 of the exact median") {
    val li = Tables(spark, dir, "lineitem")
    val (exact, approx) = li.agg(
      expr("percentile(l_quantity, 0.5)"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").cast("double"))
      .as[(Double, Double)].head()
    assert(math.abs(approx - exact) <= 2.0, s"exact=$exact approx=$approx")
  }

  test("SAMPLE is deterministic under a fixed seed and ~fraction sized") {
    val li = Tables(spark, dir, "lineitem")
    val a = li.sample(withReplacement = false, 0.1, seed = 42)
      .select("l_orderkey", "l_linenumber").collect().toSet
    val b = li.sample(withReplacement = false, 0.1, seed = 42)
      .select("l_orderkey", "l_linenumber").collect().toSet
    assert(a == b)
    val n = li.count().toDouble
    assert(a.size > n * 0.05 && a.size < n * 0.15)
  }
}
