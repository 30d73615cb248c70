package graft

import org.scalatest.funsuite.AnyFunSuite

/** DedupAggregateCalls: duplicate registered-UDAF calls in one
  * aggregate must be computed once (plan proof) with unchanged
  * results (value proof), and non-identical calls must NOT merge.
  */
class DedupAggregateCallsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("duplicate UDAF calls collapse to one evaluation, same values") {
    Graft.init(spark, dir)
    val df = Graft.sql(spark, """
      SELECT l_returnflag,
             round(avgForEach([toFloat64(l_linenumber), toFloat64(l_quantity)])[1], 6) AS a1,
             round(avgForEach([toFloat64(l_linenumber), toFloat64(l_quantity)])[2], 6) AS a2,
             round(avgForEach([toFloat64(l_quantity), 1.0])[1], 6) AS other
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
    val plan = df.queryExecution.executedPlan.toString
    // partial + final = 2 prints per distinct call; 2 distinct calls
    assert("avgforeach".r.findAllIn(plan).size == 4,
      s"expected 2 distinct avgForEach evaluations (4 prints):\n$plan")
    val rows = df.collect()
    assert(rows.length == 3)
    // cross-check one group against the builtin aggregates
    val exp = Graft.sql(spark, """
      SELECT l_returnflag, round(avg(toFloat64(l_linenumber)), 6) AS a1,
             round(avg(toFloat64(l_quantity)), 6) AS a2
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    rows.zip(exp).foreach { case (g, e) =>
      assert(g.getString(0) == e.getString(0))
      assert(g.getDouble(1) == e.getDouble(1), "a1 drifted")
      assert(g.getDouble(2) == e.getDouble(2), "a2 drifted")
    }
  }

  test("DISTINCT/FILTER variants of the same call do not merge") {
    Graft.init(spark, dir)
    val df = Graft.sql(spark, """
      SELECT o_orderstatus,
             round(avgForEach([toFloat64(o_totalprice)])[1], 4) AS plain,
             round(avgForEachIf([toFloat64(o_totalprice)], o_totalprice > 1000)[1], 4) AS filtered
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")
    val plan = df.queryExecution.executedPlan.toString
    assert("avgforeach".r.findAllIn(plan).size == 4,
      s"filtered and plain calls must stay separate:\n$plan")
    df.collect().foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(1),
        "filtered avg over >1000 subset must be >= plain avg")
    }
  }
}
