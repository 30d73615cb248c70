package graft

import org.scalatest.funsuite.AnyFunSuite

/** Gates the ENTIRE probe battery (every Probe.queries entry) in
  * `sbt test`: every probe must run, except exactly the 9 pinned
  * intentional refusals (whose message TEXT RefusalSpec asserts
  * separately).
  * Before this spec the battery only ran via `runMain graft.Probe` —
  * a dialect regression could land without any test going red.
  *
  * Probes run IN ORDER (SET-before-get and CREATE-before-INSERT
  * sequences depend on it), against the shared session: every object
  * the battery creates carries a probe-unique name, and settings land
  * in graft.ch.setting.* confs, so nothing leaks into other suites.
  */
class ProbeBatterySpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private val expectedFails = Probe.expectedRefusals

  test("every probe runs green except the 9 pinned refusals") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val problems = Probe.queries.flatMap { case (name, q) =>
      val outcome =
        try { Graft.sql(spark, q).collect(); None }
        catch { case e: Throwable => Some(e) }
      (outcome, expectedFails(name)) match {
        case (None, true) =>
          Some(s"$name: expected refusal but SUCCEEDED — a refusal became a result")
        case (Some(e), false) =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        case _ => None
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
  }
}
