package graft

import graft.ops.Aggregates
import graft.ops.Aggregates.StepEvent
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom Aggregators (SURVEY §5.2.3): the
  * partial-aggregation laws Spark relies on (merge associativity /
  * commutativity under finish) plus semantic equivalence against
  * brute-force reference implementations. ScalaCheck is driven
  * directly (no scalatestplus bridge in the offline cache).
  */
class AggregatorSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  private val W = 20L
  private val funnel = new Aggregates.WindowFunnel(W, 3)
  private val seqm = new Aggregates.SequenceMatch(3)

  private val evGen: Gen[StepEvent] = for {
    ts <- Gen.choose(0L, 50L)
    st <- Gen.choose(1, 3)
  } yield StepEvent(ts, st)
  private val evsGen: Gen[List[StepEvent]] = Gen.listOfN(10, evGen)

  /** Brute force: deepest k with an existential chain t1≤…≤tk,
    * tk−t1≤W (the windowFunnel contract).
    */
  private def bruteDepth(evs: Seq[StepEvent], w: Long, n: Int): Int = {
    def chainExists(k: Int): Boolean = {
      def go(st: Int, prev: Long, start: Long): Boolean =
        if (st > k) true
        else evs.exists(e => e.step == st && e.tsUs >= prev &&
          (st == 1 || e.tsUs - start <= w) &&
          go(st + 1, e.tsUs, if (st == 1) e.tsUs else start))
      go(1, Long.MinValue, 0L)
    }
    (1 to n).reverse.find(chainExists).getOrElse(0)
  }

  private def bruteSeq(evs: Seq[StepEvent], n: Int): Boolean = {
    def go(st: Int, prev: Long): Boolean =
      if (st > n) true
      else evs.exists(e => e.step == st && e.tsUs > prev && go(st + 1, e.tsUs))
    go(1, Long.MinValue)
  }

  test("windowFunnel DP equals brute-force exists-chain") {
    check(Prop.forAll(evsGen) { evs =>
      funnel.finish(evs) == bruteDepth(evs, W, 3)
    })
  }

  test("windowFunnel merge is associative and commutative under finish") {
    check(Prop.forAll(evsGen, evsGen, evsGen) { (a, b, c) =>
      val abc1 = funnel.finish(funnel.merge(funnel.merge(a, b), c))
      val abc2 = funnel.finish(funnel.merge(a, funnel.merge(b, c)))
      val cba = funnel.finish(funnel.merge(c, funnel.merge(b, a)))
      abc1 == abc2 && abc1 == cba
    })
  }

  test("windowFunnel depth is monotone in window size") {
    check(Prop.forAll(evsGen) { evs =>
      val small = new Aggregates.WindowFunnel(5L, 3).finish(evs)
      val large = new Aggregates.WindowFunnel(50L, 3).finish(evs)
      small <= large
    })
  }

  test("sequenceMatch greedy equals brute force (strict order)") {
    check(Prop.forAll(evsGen) { evs =>
      seqm.finish(evs) == bruteSeq(evs, 3)
    })
  }

  test("sequenceMatch merge is associative/commutative under finish") {
    check(Prop.forAll(evsGen, evsGen) { (a, b) =>
      seqm.finish(seqm.merge(a, b)) == seqm.finish(seqm.merge(b, a))
    })
  }

  test("sequenceCount greedy equals exhaustive max-disjoint-matches") {
    val sc = new Aggregates.SequenceCount(2)
    // exhaustive under the sequential non-overlap contract: each match
    // must start strictly after the previous match's completion ts
    // (matches can't interleave in time — ClickHouse scan semantics).
    def brute(evs: List[StepEvent]): Long = {
      def go(minTs: Long): Long = {
        val opts = for {
          a <- evs if a.step == 1 && a.tsUs > minTs
          b <- evs if b.step == 2 && b.tsUs > a.tsUs
        } yield 1L + go(b.tsUs)
        if (opts.isEmpty) 0L else opts.max
      }
      go(Long.MinValue)
    }
    val smallGen = Gen.listOfN(7, for {
      ts <- Gen.choose(0L, 12L); st <- Gen.choose(1, 2)
    } yield StepEvent(ts, st))
    check(Prop.forAll(smallGen) { evs =>
      sc.finish(evs) == brute(evs)
    })
  }

  test("adaptiveHistogram keeps invariants: bins ≤ n, mass preserved, ordered") {
    val gen = Gen.listOf(Gen.choose(-100.0, 100.0))
    check(Prop.forAll(gen) { xs =>
      val h = new Aggregates.AdaptiveHistogram(8)
      val bins = h.finish(xs.foldLeft(h.zero)(h.reduce))
      val massOk = bins.map(_.height).sum == xs.size.toDouble
      val sizeOk = bins.size <= 8 && (xs.isEmpty || bins.nonEmpty)
      val orderedOk = bins.sliding(2).forall {
        case Seq(a, b) => a.upper <= b.lower + 1e-9
        case _ => true
      }
      // centroid bins live WITHIN the data range (centers are convex
      // combinations of inputs); they don't necessarily cover it
      val rangeOk = xs.isEmpty ||
        (bins.head.lower >= xs.min - 1e-9 && bins.last.upper <= xs.max + 1e-9)
      massOk && sizeOk && orderedOk && rangeOk
    })
  }

  test("adaptiveHistogram exact when distinct values fit the bin budget") {
    val h = new Aggregates.AdaptiveHistogram(8)
    val xs = List(1.0, 1.0, 2.0, 5.0, 5.0, 5.0)
    val bins = h.finish(xs.foldLeft(h.zero)(h.reduce))
    assert(bins.map(_.height) == Seq(2.0, 1.0, 3.0))
  }

  test("adaptiveHistogram runs through Spark's partial/final agg path") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions.udaf
    import spark.implicits._
    val hist = udaf(new Aggregates.AdaptiveHistogram(5))
    val df = Tables(spark, "/root/testdata/sf0.001", "customer")
      .repartition(3)
      .groupBy($"c_mktsegment")
      .agg(hist($"c_acctbal").as("bins"))
    val rows = df.collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val bins = r.getSeq[org.apache.spark.sql.Row](1)
      assert(bins.size <= 5 && bins.nonEmpty)
    }
  }

  // events incl. step 0 (no condition matched — strict_order interrupters)
  private val evGen0: Gen[StepEvent] = for {
    ts <- Gen.choose(0L, 30L)
    st <- Gen.choose(0, 3)
  } yield StepEvent(ts, st)
  private val evsGen0: Gen[List[StepEvent]] = Gen.listOfN(9, evGen0)

  /** Brute force for the funnel MODES: deepest k with an exists-chain
    * under the declarative mode constraints (pairwise on consecutive
    * chain events; see WindowFunnelModes scaladoc).
    */
  private def bruteModeDepth(evs: Seq[StepEvent], w: Long, n: Int,
      sOrd: Boolean, sDed: Boolean, sInc: Boolean): Int = {
    def ok(prev: StepEvent, cur: StepEvent, level: Int): Boolean = {
      val incOk = if (sInc) prev.tsUs < cur.tsUs else prev.tsUs <= cur.tsUs
      val ordOk = !sOrd || !evs.exists(x =>
        x.tsUs > prev.tsUs && x.tsUs < cur.tsUs)
      val dedOk = !sDed || !evs.exists(x =>
        x.step >= 1 && x.step <= level &&
          x.tsUs > prev.tsUs && x.tsUs < cur.tsUs)
      incOk && ordOk && dedOk
    }
    def chainExists(k: Int): Boolean = {
      def go(st: Int, prev: Option[StepEvent], start: Long): Boolean =
        if (st > k) true
        else evs.exists(e => e.step == st &&
          prev.forall(p => ok(p, e, st - 1)) &&
          (st == 1 || e.tsUs - start <= w) &&
          go(st + 1, Some(e), if (st == 1) e.tsUs else start))
      go(1, None, 0L)
    }
    (1 to n).reverse.find(chainExists).getOrElse(0)
  }

  test("windowFunnelModes equals brute force for each mode and combined") {
    val combos = Seq((false, false, true), (true, false, false),
      (false, true, false), (true, true, true))
    check(Prop.forAll(evsGen0) { evs =>
      combos.forall { case (so, sd, si) =>
        val agg = new Aggregates.WindowFunnelModes(W, 3,
          strictOrder = so, strictDedup = sd, strictIncrease = si)
        agg.finish(evs.foldLeft(agg.zero)(agg.reduce)) ==
          bruteModeDepth(evs, W, 3, so, sd, si)
      }
    })
  }

  test("windowFunnelModes merge is associative/commutative under finish") {
    val agg = new Aggregates.WindowFunnelModes(W, 3,
      strictOrder = true, strictDedup = true)
    check(Prop.forAll(evsGen0, evsGen0) { (a, b) =>
      def bld(xs: Seq[StepEvent]) = xs.foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(bld(a), bld(b))) ==
        agg.finish(agg.merge(bld(b), bld(a)))
    })
  }

  test("windowFunnelModes strict_order: CH doc example A→B→D→C stops at 2") {
    // conditions [A=1, B=2, C=3]; D matches none (step 0) and
    // interrupts the contiguous chain between B and C
    val agg = new Aggregates.WindowFunnelModes(1000L, 3, strictOrder = true)
    val evs = Seq(StepEvent(1, 1), StepEvent(2, 2), StepEvent(3, 0), StepEvent(4, 3))
    assert(agg.finish(evs.foldLeft(agg.zero)(agg.reduce)) == 2)
    // without the interrupter the same stream completes
    val evs2 = Seq(StepEvent(1, 1), StepEvent(2, 2), StepEvent(4, 3))
    assert(agg.finish(evs2.foldLeft(agg.zero)(agg.reduce)) == 3)
  }

  test("windowFunnelModes strict_dedup: repeated met condition interrupts") {
    val agg = new Aggregates.WindowFunnelModes(1000L, 3, strictDedup = true)
    // view, view-again, click, purchase: the second view sits between
    // the FIRST view and the click — but chaining from the SECOND view
    // is clean, so depth 3 (exists-chain semantics)
    val clean = Seq(StepEvent(1, 1), StepEvent(2, 1), StepEvent(3, 2), StepEvent(4, 3))
    assert(agg.finish(clean.foldLeft(agg.zero)(agg.reduce)) == 3)
    // view, click, view-again, purchase: every view→click pair has the
    // stray view either before click (blocking 1-between) or the chain
    // must pass over it between click and purchase — depth 2
    val blocked = Seq(StepEvent(1, 1), StepEvent(2, 2), StepEvent(3, 1), StepEvent(4, 3))
    assert(agg.finish(blocked.foldLeft(agg.zero)(agg.reduce)) == 2)
  }

  test("windowFunnelModes strict_increase: equal timestamps don't chain") {
    val agg = new Aggregates.WindowFunnelModes(1000L, 3, strictIncrease = true)
    val equal = Seq(StepEvent(5, 1), StepEvent(5, 2), StepEvent(5, 3))
    assert(agg.finish(equal.foldLeft(agg.zero)(agg.reduce)) == 1)
    val base = new Aggregates.WindowFunnel(1000L, 3)
    assert(base.finish(equal) == 3) // the un-moded funnel allows ties
  }

  test("sequenceMatchTimed equals brute-force chain with gap bounds") {
    // pattern: (?1)(?t<=7)(?2)(?t>2)(?3) over small-ts events
    val timed = new Aggregates.SequenceMatchTimed(3, Seq(7L, Long.MaxValue), Seq(-1L, 2L))
    def brute(evs: Seq[StepEvent]): Boolean =
      evs.exists(a => a.step == 1 &&
        evs.exists(b => b.step == 2 && b.tsUs > a.tsUs && b.tsUs - a.tsUs <= 7 &&
          evs.exists(c => c.step == 3 && c.tsUs > b.tsUs && c.tsUs - b.tsUs > 2)))
    check(Prop.forAll(evsGen) { evs =>
      timed.finish(evs) == brute(evs)
    })
  }

  test("sequenceMatchTimed with unbounded gaps degenerates to sequenceMatch") {
    val unbounded = new Aggregates.SequenceMatchTimed(3,
      Seq(Long.MaxValue, Long.MaxValue), Seq(-1L, -1L))
    check(Prop.forAll(evsGen) { evs =>
      unbounded.finish(evs) == seqm.finish(evs)
    })
  }

  test("sequenceMatchTimed merge is associative/commutative under finish") {
    val timed = new Aggregates.SequenceMatchTimed(3, Seq(7L, 9L), Seq(-1L, 1L))
    check(Prop.forAll(evsGen, evsGen) { (a, b) =>
      timed.finish(timed.merge(a, b)) == timed.finish(timed.merge(b, a))
    })
  }

  private val strGen = Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e"))
  private val wGen = Gen.listOf(for {
    v <- Gen.oneOf("a", "b", "c", "d", "e")
    w <- Gen.choose(1L, 50L)
  } yield Aggregates.Weighted(v, w))

  test("topKWeighted is exact when distinct count fits capacity") {
    check(Prop.forAll(wGen) { xs =>
      val agg = new Aggregates.TopKWeighted(3, 8)
      val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val exact = xs.groupBy(_.v).map { case (v, g) => (v, g.map(_.w).sum) }
        .toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
      out.map(c => (c.v, c.c)) == exact
    })
  }

  test("groupBitmap counts exactly and merge is OR (incl. negatives)") {
    val gen = Gen.listOf(Gen.choose(-100000L, 100000L))
    check(Prop.forAll(gen, gen) { (xs, ys) =>
      val gb = new Aggregates.GroupBitmap
      val a = xs.foldLeft(gb.zero)(gb.reduce)
      val b = ys.foldLeft(gb.zero)(gb.reduce)
      gb.finish(a) == xs.distinct.size.toLong &&
        gb.finish(gb.merge(a, b)) == (xs ++ ys).distinct.size.toLong &&
        gb.finish(gb.merge(a, b)) == gb.finish(gb.merge(b, a))
    })
  }

  test("topKWeighted merge equals single-pass build when within capacity") {
    check(Prop.forAll(wGen, wGen) { (xs, ys) =>
      val agg = new Aggregates.TopKWeighted(3, 8)
      val merged = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) == agg.finish((xs ++ ys).foldLeft(agg.zero)(agg.reduce))
    })
  }

  test("topK is exact when distinct count fits capacity") {
    check(Prop.forAll(strGen) { xs =>
      val agg = new Aggregates.TopK(3, 8)
      val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val exact = xs.groupBy(identity).map { case (v, g) => (v, g.size.toLong) }
        .toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
      out.map(c => (c.v, c.c)) == exact
    })
  }

  test("topK merge equals single-pass build when within capacity") {
    check(Prop.forAll(strGen, strGen) { (xs, ys) =>
      val agg = new Aggregates.TopK(3, 8)
      val merged = agg.merge(
        xs.foldLeft(agg.zero)(agg.reduce), ys.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) == agg.finish((xs ++ ys).foldLeft(agg.zero)(agg.reduce))
    })
  }

  // ---- wave 27: categorical-association family ----

  /** 2×2 known-answer table (counts 10/20/30/40). Hand-computed:
    * χ² = 4/12+4/18+4/28+4/42 = 0.7936…; cramersV cross-checked via
    * the closed 2×2 form |ad−bc|/√(r₁r₂c₁c₂) = 200/√5 040 000.
    */
  private val assocRows: List[(String, String)] =
    List.fill(10)(("a1", "b1")) ++ List.fill(20)(("a1", "b2")) ++
      List.fill(30)(("a2", "b1")) ++ List.fill(40)(("a2", "b2"))

  private def assocRun(mode: String, rows: List[(String, String)]): Double = {
    val agg = new Aggregates.AssocContingency(mode)
    agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
  }

  test("assoc known answers on the 2x2 table") {
    assert(math.abs(assocRun("cramersV", assocRows) - 0.0890871) < 1e-6)
    assert(math.abs(assocRun("contingency", assocRows) - 0.0887357) < 1e-6)
    // φ² < (r−1)(c−1)/(n−1) here, so the bias-corrected V clamps to 0
    assert(assocRun("cramersVBiasCorrected", assocRows) == 0.0)
    assert(math.abs(assocRun("theilsU", assocRows) - 0.0065840) < 1e-6)
  }

  test("assoc cell-key packing survives ':' and digits in categories") {
    // "1:x"/"1" style values would corrupt a separator-based split;
    // the length-prefixed key must keep the exact same answer as
    // renamed clean categories with identical counts
    val tricky = assocRows.map { case (a, b) =>
      (if (a == "a1") "1:x" else "22", if (b == "b1") ":" else "9:z") }
    for (m <- Seq("cramersV", "theilsU", "contingency"))
      assert(math.abs(assocRun(m, tricky) - assocRun(m, assocRows)) < 1e-12)
  }

  test("assoc merge equals single-pass build") {
    val pairGen = Gen.listOf(for {
      a <- Gen.oneOf("x", "y", "z"); b <- Gen.oneOf("p", "q")
    } yield (a, b))
    check(Prop.forAll(pairGen, pairGen) { (xs, ys) =>
      Seq("cramersV", "cramersVBiasCorrected", "theilsU", "contingency")
        .forall { m =>
          val agg = new Aggregates.AssocContingency(m)
          val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
            ys.foldLeft(agg.zero)(agg.reduce))
          val once = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
          val (f1, f2) = (agg.finish(merged), agg.finish(once))
          (f1.isNaN && f2.isNaN) || f1 == f2
        }
    })
  }

  // ---- wave 28: rankCorr / ANOVA / intervalLengthSum / LTTB ----

  test("rankCorr known answers") {
    val agg = new Aggregates.RankCorr
    def run(rows: Seq[(Double, Double)]) =
      agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(run(Seq((1, 10), (2, 20), (3, 30))) == 1.0)
    assert(run(Seq((1, 30), (2, 20), (3, 10))) == -1.0)
    // tie-averaged ranks: x ranks (1.5, 1.5, 3), y ranks (1, 3, 2) →
    // Σdxdy = 0 exactly
    assert(run(Seq((1, 5), (1, 7), (2, 6))) == 0.0)
    assert(run(Seq((1, 1))).isNaN) // degenerate
  }

  test("anova known answer: groups [1,2,3] vs [2,4,6]") {
    val agg = new Aggregates.AnovaF
    val rows = Seq((1.0, 0L), (2.0, 0L), (3.0, 0L),
      (2.0, 1L), (4.0, 1L), (6.0, 1L))
    val (f, p) = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    // ssb = 6, ssw = 10, d1 = 1, d2 = 4 → F = 2.4 exactly;
    // p = I_{4/6.4}(2, 0.5) = 0.196261… (closed form worked by hand)
    assert(f == 2.4)
    assert(math.abs(p - 0.196261) < 1e-4)
  }

  test("intervalLengthSum merges overlaps and drops degenerate intervals") {
    val agg = new Aggregates.IntervalLengthSum
    def run(rows: Seq[(Double, Double)]) =
      agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(run(Seq((1, 3), (2, 5), (7, 8))) == 5.0) // union [1,5)∪[7,8)
    assert(run(Seq((5, 4), (2, 2))) == 0.0) // start ≥ end ignored
    assert(run(Seq((0, 10), (2, 3))) == 10.0) // nested
  }

  test("lttb keeps endpoints and picks the max-area point per bucket") {
    val id = new Aggregates.Lttb(4)
    val small = Vector((0.0, 0.0), (1.0, 1.0), (2.0, 2.0))
    assert(id.finish(small) == small) // n ≤ buckets → identity
    val agg = new Aggregates.Lttb(3)
    val pts = Vector((0.0, 0.0), (1.0, 1.0), (2.0, 100.0), (3.0, 3.0), (4.0, 4.0))
    // inner bucket spans x = 1..3 with the last point as anchor; the
    // y = 100 outlier has by far the largest triangle area
    assert(agg.finish(pts) == Seq((0.0, 0.0), (2.0, 100.0), (4.0, 4.0)))
  }

  test("wave-28 collected aggregators: merge equals single-pass build") {
    val ptGen = Gen.listOf(for {
      x <- Gen.choose(-50, 50); y <- Gen.choose(-50, 50)
    } yield (x.toDouble, y.toDouble))
    check(Prop.forAll(ptGen, ptGen) { (xs, ys) =>
      def law[B, O](agg: org.apache.spark.sql.expressions.Aggregator[
          (Double, Double), B, O]): Boolean = {
        val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
          ys.foldLeft(agg.zero)(agg.reduce))
        val once = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
        val (a, b) = (agg.finish(merged), agg.finish(once))
        a == b || (a.isInstanceOf[Double] &&
          a.asInstanceOf[Double].isNaN && b.asInstanceOf[Double].isNaN)
      }
      law(new Aggregates.RankCorr) && law(new Aggregates.IntervalLengthSum) &&
        law(new Aggregates.Lttb(5))
    })
    val grpGen = Gen.listOf(for {
      x <- Gen.choose(-50, 50); g <- Gen.choose(0L, 3L)
    } yield (x.toDouble, g))
    check(Prop.forAll(grpGen, grpGen) { (xs, ys) =>
      val agg = new Aggregates.AnovaF
      val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      val once = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      val (a, b) = (agg.finish(merged), agg.finish(once))
      (a == b) || (a._1.isNaN && b._1.isNaN)
    })
  }

  // ---- wave 30: ML regression pack ----

  test("linRegFit recovers exact coefficients and honors ridge shrinkage") {
    val agg = new Aggregates.LinRegFit(2, 0.0)
    // y = 2a − 3b + 7, noise-free → exact recovery
    val rows = for (a <- 0 to 6; b <- 0 to 4)
      yield (2.0 * a - 3.0 * b + 7.0, Seq(a.toDouble, b.toDouble))
    val m = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    assert(m.method == "linear")
    assert(m.weights.zip(Seq(2.0, -3.0, 7.0))
      .forall { case (w, e) => math.abs(w - e) < 1e-9 })
    // ridge shrinks the slope toward zero, intercept compensates
    val r1 = for (x <- 1 to 20) yield (3.0 * x, Seq(x.toDouble))
    def fit(l2: Double) = {
      val a = new Aggregates.LinRegFit(1, l2)
      a.finish(r1.foldLeft(a.zero)(a.reduce))
    }
    assert(math.abs(fit(0.0).weights.head - 3.0) < 1e-9)
    assert(fit(10.0).weights.head < 3.0 && fit(10.0).weights.head > 0)
  }

  test("linRegFit merge equals single-pass build") {
    val rowGen = Gen.listOf(for {
      x <- Gen.choose(-20, 20); y <- Gen.choose(-20, 20)
    } yield (y.toDouble, Seq(x.toDouble, (x % 5).toDouble)))
    check(Prop.forAll(rowGen, rowGen) { (xs, ys) =>
      val agg = new Aggregates.LinRegFit(2, 0.5)
      val merged = agg.merge(xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce))
      val once = (xs ++ ys).foldLeft(agg.zero)(agg.reduce)
      val (m, o) = (agg.finish(merged), agg.finish(once))
      // exact decimal state → identical fits; NaN != NaN under
      // Scala's numeric boxing, so the degenerate case is explicit
      m == o || (m.weights.forall(_.isNaN) && o.weights.forall(_.isNaN))
    })
  }

  test("logRegFit separates separable data and is partition-invariant") {
    val agg = new Aggregates.LogRegFit(1, 0.0)
    val rows = (-10 to 10).filter(_ != 0)
      .map(x => (if (x > 0) 1.0 else 0.0, Seq(x.toDouble / 5)))
    val m = agg.finish(rows.foldLeft(agg.zero)(agg.reduce))
    def pred(model: Aggregates.MLModel, x: Double) =
      1.0 / (1.0 + math.exp(-(model.weights(0) * x + model.weights(1))))
    assert(pred(m, -1.0) < 0.5 && pred(m, 1.0) > 0.5)
    // the canonical sort makes the fit identical under any split
    val (a, b) = rows.splitAt(7)
    val merged = agg.finish(agg.merge(
      b.foldLeft(agg.zero)(agg.reduce), a.foldLeft(agg.zero)(agg.reduce)))
    assert(merged == m)
  }

  test("collected-state aggregators fail loudly at the shared cap, naming the bounded alternative") {
    // The cap (2^24 values per group) exists so a hot group at scale
    // fails with guidance instead of silently spilling/OOMing. Pin the
    // threshold and the refusal text (the guidance IS the contract).
    assert(Aggregates.CollectCap == (1 << 24))
    // under the cap: no throw
    Aggregates.capCheck(Aggregates.CollectCap - 1, "x", "y")
    def msg(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    val m = msg(Aggregates.capCheck(Aggregates.CollectCap, "mannWhitneyUTest",
      "sample the group or use meanZTest (moment-based, O(1) state)"))
    assert(m.contains("mannWhitneyUTest: group exceeds 16777216 collected values"))
    assert(m.contains("meanZTest"))
    // the aggregators keep working under the cap (wiring sanity)
    val mw = new Aggregates.MannWhitneyU()
    assert(mw.finish(mw.reduce(mw.reduce(mw.zero, (1.0, 0L)), (2.0, 1L)))._1 >= 0.0)
    val alts = Seq(
      ("lttb", "pre-aggregate the series into time buckets"),
      ("kolmogorovSmirnovTest", "quantileTDigest"),
      ("rankCorr", "window-ranked columns"),
      ("intervalLengthSum", "pre-merge intervals"))
    alts.foreach { case (fn, alt) =>
      assert(msg(Aggregates.capCheck(Aggregates.CollectCap, fn, alt))
        .contains(fn) )
    }
  }
}
