package graft

import graft.ops.Relational
import graft.plans.LimitByPlan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Systematic grid over the ChSql clause combinations: every subset of
  * {SAMPLE, WITH TOTALS, final LIMIT} × {plain / LIMIT BY / WITH FILL}
  * built as verbatim CH text AND as the equivalent DataFrame pipeline,
  * compared row-for-row. This pins the peel ORDER (FORMAT → LIMIT →
  * LIMIT BY → ORDER BY/FILL) and the textual rewrites against the
  * operator semantics, beyond the single-point oracle entries.
  */
class ChSqlComboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq // ORDER-sensitive compare

  private def sampled(base: DataFrame): DataFrame = {
    import spark.implicits._
    base.filter(graft.ops.Text.mh60(lit("smp"), $"l_orderkey") % 1000000 < 200000)
  }

  test("clause grid: text == DataFrame pipeline for every combination") {
    import spark.implicits._
    Graft.init(spark, dir)
    val base = Tables(spark, dir, "lineitem")

    for {
      sample <- Seq(false, true)
      tail <- Seq("plain", "limitBy", "fill")
      finalLimit <- Seq(false, true)
    } {
      val sampleSql = if (sample) " SAMPLE 0.2" else ""
      val limitSql = if (finalLimit) "\nLIMIT 7" else ""
      val (tailSql, expected) = tail match {
        case "plain" =>
          ("ORDER BY l_quantity ASC, l_returnflag ASC", {
            val src = if (sample) sampled(base) else base
            src.groupBy($"l_quantity", $"l_returnflag")
              .agg(count(lit(1)).as("n"))
              .orderBy($"l_quantity", $"l_returnflag")
          })
        case "limitBy" =>
          ("ORDER BY l_quantity ASC, l_returnflag ASC\nLIMIT 2 BY l_quantity", {
            val src = if (sample) sampled(base) else base
            val agg = src.groupBy($"l_quantity", $"l_returnflag")
              .agg(count(lit(1)).as("n"))
            LimitByPlan.limitBy(agg, Seq("l_quantity"), 2,
              Seq(("l_quantity", true), ("l_returnflag", true)))
              .orderBy($"l_quantity", $"l_returnflag")
          })
        case "fill" =>
          ("ORDER BY l_quantity ASC WITH FILL FROM 1 TO 51 STEP 1", {
            val src = if (sample) sampled(base) else base
            val agg = src.groupBy($"l_quantity").agg(count(lit(1)).as("n"))
            Relational.withFillStep(agg, "l_quantity", 1L, 51L, 1L,
              Map("n" -> lit(0L))).orderBy($"l_quantity")
          })
      }
      val groupCols =
        if (tail == "fill") "l_quantity" else "l_quantity, l_returnflag"
      val selectCols = groupCols
      val text =
        s"""SELECT $selectCols, count(*) AS n
           |FROM lineitem$sampleSql
           |GROUP BY $groupCols
           |$tailSql$limitSql
           |FORMAT TabSeparated""".stripMargin
      val viaText = Graft.sql(spark, text)
      val viaDf = if (finalLimit) expected.limit(7) else expected
      assert(canon(viaText) == canon(viaDf),
        s"mismatch for sample=$sample tail=$tail limit=$finalLimit:\n$text")
    }
  }

  test("WITH TOTALS composes with SAMPLE and final LIMIT") {
    import spark.implicits._
    Graft.init(spark, dir)
    val viaText = Graft.sql(spark, """
      SELECT l_returnflag, count(*) AS n
      FROM lineitem SAMPLE 0.2
      GROUP BY l_returnflag WITH TOTALS
      ORDER BY l_returnflag
      LIMIT 3""")
    val src = sampled(Tables(spark, dir, "lineitem"))
    val per = src.groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
    val tot = src.agg(count(lit(1)).as("n"))
      .select(lit(null).cast("string").as("l_returnflag"), $"n")
    val viaDf = per.unionByName(tot)
      .orderBy($"l_returnflag".asc_nulls_first).limit(3)
    assert(canon(viaText) == canon(viaDf))
  }

  test("round-8 features composed: params + recursive + ternary + moving aggs") {
    Graft.init(spark, dir)
    Graft.sql(spark, "SET param_combo_lim = 4")
    // query parameter bounds the recursive anchor set; ternary labels
    // parity; parametric groupArray(n) + moving sum run over the
    // recursive output — four round-8 features in ONE text
    val rows = Graft.sql(spark, """
      WITH RECURSIVE r AS (
        SELECT CAST(n_nationkey AS Int64) AS n FROM nation
        WHERE n_nationkey < {combo_lim:Int64}
        UNION ALL
        SELECT n + 10 AS n FROM r WHERE n < 20)
      SELECT n % 2 = 0 ? 'even' : 'odd' AS par,
             count() AS c,
             arrayStringConcat(arrayMap(x -> toString(x),
               groupArray(3)(n)), '|') AS g3,
             arrayStringConcat(arrayMap(x -> toString(x),
               groupArrayMovingSum(2)(n)), '|') AS ms2
      FROM r GROUP BY par ORDER BY par""").collect()
    assert(rows.length == 2)
    val even = rows.find(_.getString(0) == "even").get
    val odd = rows.find(_.getString(0) == "odd").get
    // anchors 0..3, each chain +10 to 20: evens {0,10,20,2,12,22}
    // odds {1,11,21,3,13,23}
    assert(even.getLong(1) == 6L && odd.getLong(1) == 6L)
    assert(even.getString(2) == "0|2|10" && odd.getString(2) == "1|3|11")
    assert(even.getString(3).startsWith("0|2|12") ||
      even.getString(3) == "0|2|12|22|32|42")
  }

  test("absolute SAMPLE n: exact top-k below threshold, hash-threshold scan above") {
    Graft.init(spark, dir)
    // small n keeps the exact contract: exactly n rows
    val small = Graft.sql(spark,
      "SELECT count() AS c FROM lineitem SAMPLE 100").collect().head
    assert(small.getLong(0) == 100L)
    // large n (above sampleNApproxThreshold): approximately n rows via
    // the hash-cutoff filter — plan must carry NO TakeOrdered and no
    // Sort (the scan filter IS the sample); count lands within the
    // binomial noise band (±5σ ≈ ±5·√n) or equals the full table when
    // n >= count
    val prev = ChSql.sampleNApproxThreshold
    try {
      ChSql.sampleNApproxThreshold = 500L
      val df = Graft.sql(spark,
        "SELECT l_orderkey FROM lineitem SAMPLE 2000")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("TakeOrdered"), plan)
      assert(!plan.contains("Sort "), plan)
      val c = df.count()
      assert(math.abs(c - 2000L) <= 5 * math.sqrt(2000).toLong,
        s"sampled $c rows for SAMPLE 2000")
      // determinism: identical set on re-run (hash cutoff is pure)
      assert(df.count() == c)
    } finally ChSql.sampleNApproxThreshold = prev
  }
}
