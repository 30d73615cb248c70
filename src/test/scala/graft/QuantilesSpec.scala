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

  test("weighted quantiles equal the brute-force cumulative-weight scan") {
    // brute force: sort (value, weight) pairs, pick the first value
    // whose cumulative weight reaches q·W — the CH
    // QuantileExactWeighted contract the operator implements
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(300)((rnd.nextInt(20).toDouble, rnd.nextInt(9) + 1L))
    val probes = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    def brute(q: Double): Double = {
      val sorted = data.groupBy(_._1).view.mapValues(_.map(_._2).sum)
        .toSeq.sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0L
      sorted.find { case (_, w) => cum += w; cum >= q * total }.get._1
    }
    val df = data.toDF("v", "w").withColumn("g", lit("all"))
    val got = Quantiles.exactQuantilesWeighted(df, Seq("g"), col("v"), col("w"), probes)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    probes.foreach { q =>
      assert(got(q) == brute(q), s"q=$q: got ${got(q)} want ${brute(q)}")
    }
  }

  test("weighted quantiles: unit weights degenerate to the discrete quantile") {
    val li = Tables(spark, dir, "lineitem")
    val w1 = Quantiles.exactQuantilesWeighted(li, Seq("l_returnflag"),
      col("l_quantity"), lit(1L), Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // quantile_disc semantics: first value with cumcount >= 0.5·n
    val want = li.groupBy($"l_returnflag")
      .agg(expr("percentile_approx(l_quantity, 0.5, 100000)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    w1.foreach { case (g, v) =>
      assert(math.abs(v - want(g)) <= 1.0, s"$g: $v vs ${want(g)}")
    }
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
