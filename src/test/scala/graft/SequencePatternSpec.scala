package graft

import graft.ops.Aggregates
import graft.ops.Aggregates.{SeqPattern, StepEvent}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The sequenceMatch pattern-DSL front door: parser unit tests plus
  * property equivalence of the shared DP against brute-force chain
  * enumeration (gap bounds + CH's no-skip contiguity rule), and
  * against SequenceMatchTimed on its `.*`-between-steps domain.
  */
class SequencePatternSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("parser extracts steps, gaps, and contiguity") {
    val p = SeqPattern.parse("(?1)(?t<=3600)(?2).*(?3)")
    assert(p.steps == IndexedSeq(1, 2, 3))
    assert(p.maxGapUs == IndexedSeq(3600000000L, Long.MaxValue))
    assert(p.minGapUs == IndexedSeq(-1L, -1L))
    assert(p.contiguous == IndexedSeq(true, false))

    val q = SeqPattern.parse("(?2)(?t>1800)(?1)")
    assert(q.steps == IndexedSeq(2, 1))
    assert(q.minGapUs == IndexedSeq(1800000000L))
    assert(q.maxGapUs == IndexedSeq(Long.MaxValue))

    val r = SeqPattern.parse("(?1)(?t==60)(?2)")
    assert(r.maxGapUs == IndexedSeq(60000000L))
    assert(r.minGapUs == IndexedSeq(60000000L - 1))

    val s = SeqPattern.parse("(?1)(?t>=10)(?t<100)(?2)")
    assert(s.minGapUs == IndexedSeq(10000000L - 1))
    assert(s.maxGapUs == IndexedSeq(100000000L - 1))

    // repeated conditions are positions, not conditions
    val t = SeqPattern.parse("(?1).*(?1).*(?2)")
    assert(t.steps == IndexedSeq(1, 1, 2))
  }

  test("parser rejects malformed patterns loudly") {
    for (bad <- Seq("", "(?1)(?t<=5)", ".*(?1)", "(?1)garbage(?2)",
      "(?0x)(?2)", "(?1)..(?2)"))
      intercept[IllegalArgumentException](SeqPattern.parse(bad))
  }

  private val evGen: Gen[StepEvent] = for {
    ts <- Gen.choose(0L, 12L)
    st <- Gen.choose(1, 3)
  } yield StepEvent(ts * 1000000L, st) // second-scale ts in µs, many ties
  private val evsGen: Gen[List[StepEvent]] = Gen.choose(0, 9)
    .flatMap(n => Gen.listOfN(n, evGen))

  private val patternGen: Gen[String] = Gen.oneOf(
    "(?1)(?2)", "(?1).*(?2)", "(?1)(?t<=3)(?2)", "(?1)(?t>2)(?2)",
    "(?1).*(?t<=5)(?2)", "(?1)(?2)(?3)", "(?1).*(?2).*(?3)",
    "(?1)(?t<=4)(?2)(?t>1)(?3)", "(?2)(?1)", "(?1)(?t==2)(?2)",
    "(?1).*(?1)", "(?3)(?t<5)(?2)")

  /** Brute force: enumerate every chain of events matching the
    * pattern positions at strictly increasing timestamps, checking
    * each transition's gap window and (without `.*`) that no declared
    * event lies strictly between.
    */
  private def brute(events: Seq[StepEvent], p: SeqPattern): Boolean = {
    val declared = events.filter(_.step >= 1)
    val allTs = declared.map(_.tsUs)
    def between(lo: Long, hi: Long) = allTs.exists(t => t > lo && t < hi)
    def rec(pos: Int, lastTs: Long): Boolean =
      if (pos == p.nPositions) true
      else declared.exists { e =>
        e.step == p.steps(pos) &&
          (pos == 0 || (e.tsUs > lastTs &&
            e.tsUs - lastTs <= p.maxGapUs(pos - 1) &&
            e.tsUs - lastTs > p.minGapUs(pos - 1) &&
            (!p.contiguous(pos - 1) || !between(lastTs, e.tsUs)))) &&
          rec(pos + 1, e.tsUs)
      }
    rec(0, Long.MinValue)
  }

  test("patternMatches equals brute-force enumeration") {
    check(Prop.forAll(evsGen, patternGen) { (evs, pat) =>
      val p = SeqPattern.parse(pat)
      Aggregates.patternMatches(evs, p) == brute(evs, p)
    })
  }

  test("pattern with .* and (?t<=) gaps equals SequenceMatchTimed") {
    val timed = new Aggregates.SequenceMatchTimed(3,
      Seq(4000000L, 6000000L), Seq(-1L, -1L))
    val p = SeqPattern.parse("(?1).*(?t<=4)(?2).*(?t<=6)(?3)")
    check(Prop.forAll(evsGen) { evs =>
      Aggregates.patternMatches(evs, p) ==
        timed.finish(evs.foldLeft(timed.zero)(timed.reduce))
    })
  }

  test("aggregator: merge order never changes the answer") {
    val agg = new Aggregates.SequenceMatchPattern("(?1)(?t<=5)(?2)", 3)
    check(Prop.forAll(evsGen, evsGen) { (a, b) =>
      val ab = agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce)))
      val ba = agg.finish(agg.merge(
        b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
      ab == ba
    })
  }

  test("patternCount on linear .* patterns equals SequenceCount") {
    val sc = new Aggregates.SequenceCount(3)
    val p = SeqPattern.parse("(?1).*(?2).*(?3)")
    check(Prop.forAll(evsGen) { evs =>
      Aggregates.patternCountNonOverlap(evs, p) ==
        sc.finish(evs.foldLeft(sc.zero)(sc.reduce))
    })
  }

  test("patternCount known answers: adjacency and gaps bound the count") {
    def ev(pairs: (Long, Int)*) = pairs.map { case (t, s) => StepEvent(t * 1000000L, s) }
    // three clean 1→2 alternations, skips allowed
    assert(Aggregates.patternCountNonOverlap(
      ev(1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2, 5L -> 1, 6L -> 2),
      SeqPattern.parse("(?1).*(?2)")) == 3)
    // adjacency: the stray cond-1 event between 1 and 2 breaks the
    // middle occurrence (1@3 → 1@5 interrupts 1@3..2@6)
    assert(Aggregates.patternCountNonOverlap(
      ev(1L -> 1, 2L -> 2, 3L -> 1, 5L -> 1, 6L -> 2),
      SeqPattern.parse("(?1)(?2)")) == 2)
    // gap bound: only pairs within 2s count; (1,2) and (5,6) qualify,
    // the leftover 1@9 with 2@20 does not
    assert(Aggregates.patternCountNonOverlap(
      ev(1L -> 1, 2L -> 2, 5L -> 1, 6L -> 2, 9L -> 1, 20L -> 2),
      SeqPattern.parse("(?1)(?t<=2)(?2)")) == 2)
    // non-overlap is the TIME-window sense (CH rescans after the
    // match end): 1,1,2,2 yields ONE match — after 1@1..2@3 completes
    // only 2@4 remains, even though two event-disjoint pairs exist
    assert(Aggregates.patternCountNonOverlap(
      ev(1L -> 1, 2L -> 1, 3L -> 2, 4L -> 2),
      SeqPattern.parse("(?1).*(?2)")) == 1)
  }

  test("count aggregator: merge order never changes the answer") {
    val agg = new Aggregates.SequenceCountPattern("(?1)(?t<=5)(?2)", 2)
    check(Prop.forAll(evsGen, evsGen) { (a, b) =>
      agg.finish(agg.merge(
        a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))) ==
        agg.finish(agg.merge(
          b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
    })
  }

  test("declared-but-unused conditions interrupt adjacency (CH no-skip rule)") {
    // view(1) then click(2) then purchase(3); pattern (?1)(?3) with 3
    // declared conditions: the cond-2 event between them breaks
    // adjacency, .* restores it
    val evs = Seq(StepEvent(1000000L, 1), StepEvent(2000000L, 2),
      StepEvent(3000000L, 3))
    val adj = new Aggregates.SequenceMatchPattern("(?1)(?3)", 3)
    val skip = new Aggregates.SequenceMatchPattern("(?1).*(?3)", 3)
    assert(!adj.finish(evs.foldLeft(adj.zero)(adj.reduce)))
    assert(skip.finish(evs.foldLeft(skip.zero)(skip.reduce)))
  }
}
