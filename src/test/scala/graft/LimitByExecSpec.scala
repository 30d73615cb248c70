package graft

import graft.ops.Relational
import graft.plans.LimitByPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom LIMIT n BY physical operator (SURVEY §2.10(c)):
  * result-identical to the window-function form, with map-side
  * pruning BEFORE the exchange (the scale win the window form can't
  * have — it must shuffle every row).
  */
class LimitByExecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("custom exec equals the window-function limitBy on fixture data") {
    val part = Tables(spark, "/root/testdata/sf0.001", "part")
      .repartition(7) // force multiple input partitions for the partial stage
    val viaExec = LimitByPlan.limitBy(part, Seq("p_brand"), 2,
      Seq(("p_retailprice", false), ("p_partkey", true)))
      .select($"p_brand", $"p_partkey", $"p_retailprice")
    val viaWindow = Relational.limitBy(part, Seq("p_brand"), 2,
      Seq($"p_retailprice".desc, $"p_partkey".asc))
      .select($"p_brand", $"p_partkey", $"p_retailprice")
    assert(canon(viaExec) == canon(viaWindow))
    assert(viaExec.count() > 0)
  }

  test("plan shape: partial prune below the exchange, final above") {
    val part = Tables(spark, "/root/testdata/sf0.001", "part").repartition(5)
    val df = LimitByPlan.limitBy(part, Seq("p_brand"), 3,
      Seq(("p_retailprice", false), ("p_partkey", true)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("FinalLimitBy"), plan)
    assert(plan.contains("PartialLimitBy"), plan)
    // the partial stage must sit BELOW the shuffle (map side)
    val exchangeIdx = plan.indexOf("Exchange")
    val partialIdx = plan.indexOf("PartialLimitBy")
    val finalIdx = plan.indexOf("FinalLimitBy")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx && finalIdx < exchangeIdx,
      s"expected Final < Exchange < Partial in:\n$plan")
  }

  test("partial stage prunes: at most n·keys rows cross the exchange per partition") {
    // 1000 rows, 4 keys, n=2 → the partial output can't exceed
    // 4 keys · 2 rows · 8 partitions = 64 rows, far below 1000
    val df = spark.range(1000)
      .select(($"id" % 4).as("k"), $"id".as("v"))
      .repartition(8)
    val pruned = LimitByPlan.limitBy(df, Seq("k"), 2, Seq(("v", true)))
    val rows = pruned.collect()
    assert(rows.length == 8) // 4 keys × 2
    // global answer: smallest two v per k
    val expected = (0 until 4).flatMap(k => Seq((k, k), (k, k + 4))).toSet
    assert(rows.map(r => (r.getLong(0).toInt, r.getLong(1).toInt)).toSet == expected)
  }

  test("SQL metrics account for every input row: pruned + kept + passed") {
    // 1000 rows, 4 keys, n=2, no cap hit: prunedRows must be
    // 1000 − (partial output rows); passThroughRows 0
    val df = spark.range(1000)
      .select(($"id" % 4).as("k"), $"id".as("v"))
      .repartition(8)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    // AQE wraps completed stages in leaf nodes — recurse through them
    def findPartial(p: SparkPlan): Option[graft.plans.PartialLimitByExec] = p match {
      case x: graft.plans.PartialLimitByExec => Some(x)
      case a: AdaptiveSparkPlanExec => findPartial(a.executedPlan)
      case s: QueryStageExec => findPartial(s.plan)
      case other => other.children.flatMap(findPartial(_)).headOption
    }
    val limited = LimitByPlan.limitBy(df, Seq("k"), 2, Seq(("v", true)))
    limited.collect()
    val partial = findPartial(limited.queryExecution.executedPlan).get
    val out = partial.metrics("numOutputRows").value
    assert(partial.metrics("prunedRows").value == 1000 - out)
    assert(partial.metrics("passThroughRows").value == 0)
    assert(out >= 8 && out <= 64) // ≥ n·keys, ≤ n·keys·partitions

    // tiny cap: pass-through rows appear, accounting still exact
    val many = spark.range(2000)
      .select(($"id" % 500).as("k"), $"id".as("v")).repartition(4)
    val capped = LimitByPlan.limitBy(many, Seq("k"), 1, Seq(("v", true)), maxKeys = 16)
    capped.collect()
    val p2 = findPartial(capped.queryExecution.executedPlan).get
    val passed = p2.metrics("passThroughRows").value
    assert(passed > 0, "expected over-cap pass-through")
    assert(p2.metrics("prunedRows").value ==
      2000 - p2.metrics("numOutputRows").value,
      "pruned must equal input minus emitted (pass-through rows are emitted)")
  }

  test("randomized: custom exec equals window form across data shapes") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val rows = Seq.fill(200)((rnd.nextInt(6), rnd.nextInt(40), rnd.nextInt(1000)))
      val df = rows.toDF("g", "p", "t").repartition(1 + rnd.nextInt(9))
      val n = 1 + rnd.nextInt(4)
      val viaExec = LimitByPlan.limitBy(df, Seq("g"), n,
        Seq(("p", true), ("t", true)))
      val viaWindow = Relational.limitBy(df, Seq("g"), n, Seq($"p".asc, $"t".asc))
      assert(canon(viaExec) == canon(viaWindow), s"trial $trial n=$n")
    }
  }

  test("high-cardinality keys under a tiny maxKeys cap: correct, memory-bounded") {
    // 5000 distinct keys with cap=8: each partition tracks at most 8
    // heaps; the other keys' rows ship un-pruned and the final stage
    // prunes them. Answer must equal the window form exactly.
    val df = spark.range(10000)
      .select(($"id" % 5000).as("k"), ($"id" * 37 % 101).as("v"), $"id".as("t"))
      .repartition(8)
    val viaExec = LimitByPlan.limitBy(df, Seq("k"), 1,
      Seq(("v", true), ("t", true)), maxKeys = 8)
    val viaWindow = Relational.limitBy(df, Seq("k"), 1, Seq($"v".asc, $"t".asc))
    assert(viaExec.count() == 5000)
    assert(canon(viaExec) == canon(viaWindow))
  }

  test("cap pass-through keeps pruning for already-tracked keys") {
    // keys arrive skewed: key 0 dominates; with cap=1 only the first
    // key seen per partition is pruned, everything else passes through
    // — still exact.
    val rows = (0 until 2000).map(i => (i % 3, i, s"r$i"))
    val df = rows.toDF("g", "p", "t").repartition(4)
    val viaExec = LimitByPlan.limitBy(df, Seq("g"), 2,
      Seq(("p", true)), maxKeys = 1)
    val viaWindow = Relational.limitBy(df, Seq("g"), 2, Seq($"p".asc))
    assert(canon(viaExec) == canon(viaWindow))
  }

  test("ties broken by the full sort order, deterministically") {
    val df = Seq(("a", 1, "x"), ("a", 1, "y"), ("a", 2, "z"), ("b", 5, "w"))
      .toDF("g", "p", "t").repartition(3)
    val out = LimitByPlan.limitBy(df, Seq("g"), 2, Seq(("p", true), ("t", true)))
      .orderBy("g", "p", "t").collect()
    assert(out.map(_.getString(2)).toSeq == Seq("x", "y", "w"))
  }
}
