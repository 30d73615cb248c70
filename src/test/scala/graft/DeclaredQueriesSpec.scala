package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture-drift tripwire (round-6 postmortem): when the driver
  * regenerated events.parquet with a different ts physical type, 14
  * declared queries started throwing at ANALYSIS time and silently
  * vanished from the correctness gate — no test noticed, because no
  * test even analyzed them. This spec forces Catalyst analysis of
  * EVERY SparkEntry.queries DataFrame against sf0.001, so any
  * schema/type rot across the whole declared surface turns the suite
  * red in seconds (analysis only — no jobs run).
  */
class DeclaredQueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("every declared query analyzes against the current fixtures") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, dir).queryExecution.analyzed // force resolution
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(2).mkString(" | ")}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} declared queries fail analysis:\n" + failures.mkString("\n"))
  }
}
