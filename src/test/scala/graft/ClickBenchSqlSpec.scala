package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.ClickBenchQueries

/** "A ClickHouse user's benchmark runs unchanged": every one of the
  * 43 ClickBench query texts goes through the CH SQL front door
  * (`Graft.sql`) against the registered `cb_hits` view and must
  * return the SAME rows as the declared DataFrame-path entry (which
  * the DuckDB oracle gate hash-checks independently). This pins the
  * front door's clause routing — GROUP BY expressions, HAVING,
  * LIMIT/OFFSET, regexp/LIKE, CASE-in-GROUP-BY — against a realistic
  * whole-workload corpus, not single-feature probes.
  */
class ClickBenchSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("all 43 ClickBench texts run via Graft.sql and match the declared path") {
    Graft.init(spark, dir)
    ClickBenchQueries.hits(spark, dir).createOrReplaceTempView("cb_hits")
    val mismatches = ClickBenchQueries.suite.toSeq.sortBy(_._1).flatMap {
      case (name, text) =>
        val viaFrontDoor = Graft.sql(spark, text).collect().toSeq
        val viaDeclared =
          SparkEntry.queries(name)(spark, dir).collect().toSeq
        if (viaFrontDoor.map(_.toString) == viaDeclared.map(_.toString)) None
        else Some(s"$name: front-door ${viaFrontDoor.size} rows vs " +
          s"declared ${viaDeclared.size}")
    }
    assert(ClickBenchQueries.suite.size == 43)
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
  }
}
