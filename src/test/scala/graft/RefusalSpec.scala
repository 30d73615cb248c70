package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the MESSAGE TEXT of the probe battery's 9 intentional
  * loud-fails (SURVEY §8). Each refusal's guidance (the suggested
  * rewrite / bounded alternative) IS the contract: silent wording
  * drift — or worse, an accidental registration turning a refusal into
  * a wrong answer — must fail this spec, not be discovered by a user.
  * The queries are verbatim from Probe.scala's battery.
  */
class RefusalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** None if the query unexpectedly SUCCEEDS; Some(message) if it fails. */
  private def refusal(q: String): Option[String] = {
    Graft.init(spark, "/root/testdata/sf0.001")
    try { Graft.sql(spark, q).collect(); None }
    catch { case e: Exception => Some(Option(e.getMessage).getOrElse(e.toString)) }
  }

  // (probe name, query, required message substrings)
  private val cases: Seq[(String, String, Seq[String])] = Seq(
    ("neighbor_fn",
      "SELECT n_nationkey, runningDifference(n_nationkey) AS d FROM (SELECT n_nationkey FROM nation ORDER BY n_nationkey LIMIT 5)",
      Seq("runningDifference is block-order dependent",
        "lag(x, 1, x) OVER")),
    ("from_final",
      "SELECT count() AS c FROM nation FINAL",
      Seq("FINAL needs engine key metadata", "registerFinal")),
    ("str_tests_unsupported",
      "SELECT surrogate_nothing() AS x",
      Seq("Cannot resolve routine", "surrogate_nothing")),
    ("neighbor_running_unsupported",
      "SELECT runningAccumulate_nothing() AS x",
      Seq("Cannot resolve routine", "runningAccumulate_nothing")),
    // indexHint returns CH's literal 1 (its documented value); Spark's
    // type checker then refuses it in WHERE — intentional: silently
    // mapping to TRUE would pretend the hint filtered when CH's
    // indexHint never filters rows at all.
    ("w15_meta_hint",
      "SELECT hasColumnInTable('nation', 'n_name') AS has1, hasColumnInTable('nation', 'nope') AS has0, count() AS c FROM nation WHERE indexHint(n_regionkey = 1)",
      Seq("FILTER_NOT_BOOLEAN")),
    ("running_diff_order",
      "SELECT neighbor_nothing() FROM nation LIMIT 1",
      Seq("Cannot resolve routine", "neighbor_nothing")),
    ("w17_url_loud",
      "SELECT count() FROM url('http://example.com/x.csv', 'CSV')",
      Seq("table function 'url' needs a remote source", "file(")),
    ("w19_kostik_loud",
      "SELECT kostikConsistentHash(16045690984833335023, 2) AS h",
      Seq("kostikConsistentHash (sumbur) is not implemented",
        "jumpConsistentHash")),
    ("w21_deltasum_loud",
      "SELECT deltaSum(n_nationkey) AS ds FROM nation",
      Seq("deltaSum is aggregation-order dependent", "deltaSumTimestamp")))

  test("NoFallback's refusal signatures are pinned subsets of the guidance") {
    // NoFallback accepts a refusal-probe failure ONLY when the message
    // chain carries Probe.refusalSignatures(name); each signature must
    // be one of the substrings this spec pins, and the name sets must
    // match exactly, or the two gates could disagree.
    assert(Probe.refusalSignatures.keySet == cases.map(_._1).toSet)
    Probe.refusalSignatures.foreach { case (name, sigs) =>
      val pinned = cases.find(_._1 == name).get._3
      sigs.foreach(s => assert(pinned.contains(s),
        s"$name: NoFallback signature '$s' is not a pinned guidance substring"))
    }
  }

  test("all 9 intentional refusals fire with their pinned guidance text") {
    val bad = cases.flatMap { case (name, q, subs) =>
      refusal(q) match {
        case None =>
          Seq(s"$name: query no longer fails — a refusal became a result")
        case Some(msg) => subs.collect {
          case s if !msg.contains(s) =>
            s"$name: missing '$s' in: ${msg.take(200)}"
        }
      }
    }
    assert(bad.isEmpty, bad.mkString("\n"))
  }
}
