package graft

import graft.ops.Quantiles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed exact-quantile operator must agree with Spark's
  * builtin `percentile` (which defines the interpolation contract)
  * on both a low-cardinality and a continuous column.
  */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"
  private val qs = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

  private def compare(valueCol: String): Unit = {
    val li = Tables(spark, dir, "lineitem")
    val got = Quantiles.exactQuantiles(li, Seq("l_returnflag"), col(valueCol), qs)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val qsSql = qs.mkString("array(", ", ", ")")
    val want = li.groupBy($"l_returnflag")
      .agg(expr(s"percentile($valueCol, $qsSql)").as("p"))
      .collect().flatMap { r =>
        r.getSeq[Double](1).zip(qs).map { case (v, q) => (r.getString(0), q) -> v }
      }.toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) <= 1e-9 * math.max(1.0, math.abs(want(k))),
        s"$valueCol $k: got $v want ${want(k)}")
    }
  }

  test("distributed exact quantiles equal builtin percentile (low cardinality)") {
    compare("l_quantity")
  }

  test("distributed exact quantiles equal builtin percentile (continuous)") {
    compare("l_extendedprice")
  }

  test("NULL values are ignored, matching percentile/quantile_cont") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(5.0)), ("a", None))
      .toDF("g", "v")
    val got = Quantiles.exactQuantiles(df, Seq("g"), col("v"), Seq(0.5))
      .collect().head.getDouble(2)
    assert(got == 3.0, s"median should ignore NULLs, got $got")
  }

  test("plan: heavy reduction is a partial-aggregated count, not a row buffer") {
    val li = Tables(spark, dir, "lineitem")
    val plan = Quantiles.exactQuantiles(li, Seq("l_returnflag"), col("l_quantity"), Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"expected map-side combine in:\n$plan")
    assert(!plan.contains("percentile"))
  }
}
