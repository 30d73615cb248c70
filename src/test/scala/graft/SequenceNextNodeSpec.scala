package graft

import graft.ops.Sequences
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ops/Sequences.nextNode — CH sequenceNextNode semantics on crafted
  * event lists: consecutive-chain matching, all direction × base
  * combinations, short-list and no-match edges. The oracle-checked
  * `funnel_next_node` entry covers the fixture-scale path; this spec
  * pins the per-combination contract.
  */
class SequenceNextNodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** One row whose sorted event list is exactly `ets` in order. */
  private def run(ets: Seq[String], chain: Seq[String],
      direction: String, base: String): Option[String] = {
    import spark.implicits._
    val df = ets.zipWithIndex
      .map { case (et, i) => (1L, i.toLong, i.toLong, et) }
      .toDF("k", "us", "event_id", "et")
    val out = df.groupBy($"k")
      .agg(sort_array(collect_list(struct($"us", $"event_id", $"et"))).as("l"))
      .select(Sequences.nextNode($"l", chain, direction, base).as("nn"))
      .collect()(0)
    Option(out.getString(0))
  }

  private val tl = Seq("A", "B", "A", "B", "C", "B")

  test("forward/head: chain must start at the first event") {
    assert(run(tl, Seq("A", "B"), "forward", "head") == Some("A"))
    assert(run(tl, Seq("B", "A"), "forward", "head") == None)
  }

  test("forward/first_match and last_match pick first/last occurrence") {
    assert(run(tl, Seq("A", "B"), "forward", "first_match") == Some("A"))
    // last A,B pair starts at index 3 (0-based 2) → next is C
    assert(run(tl, Seq("A", "B"), "forward", "last_match") == Some("C"))
  }

  test("chain must be CONSECUTIVE — gaps do not match") {
    // A…C never adjacent in A B A B C B
    assert(run(tl, Seq("A", "C"), "forward", "first_match") == None)
  }

  test("backward scans new→old; tail anchors at the newest event") {
    // reversed list: B C B A B A; chain B,C matches at head → next=B
    assert(run(tl, Seq("B", "C"), "backward", "tail") == Some("B"))
    assert(run(tl, Seq("C", "B"), "backward", "tail") == None)
    // first match scanning newest-first of (B,A): positions 3,5 → next
    // after reversed index 3 (A) is B
    assert(run(tl, Seq("B", "A"), "backward", "first_match") == Some("B"))
  }

  test("no next event after a chain ending at the boundary → null") {
    // chain C,B ends at the last event; nothing after it
    assert(run(tl, Seq("C", "B"), "forward", "first_match") == None)
  }

  test("lists shorter than the chain → null, single-event list works") {
    assert(run(Seq("A"), Seq("A", "B"), "forward", "first_match") == None)
    assert(run(Seq("A", "B"), Seq("A"), "forward", "head") == Some("B"))
  }

  test("invalid direction/base fail loudly") {
    intercept[IllegalArgumentException] {
      run(tl, Seq("A"), "sideways", "head")
    }
    intercept[IllegalArgumentException] {
      run(tl, Seq("A"), "forward", "middle_match")
    }
  }
}
