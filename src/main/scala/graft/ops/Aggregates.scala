package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.reflect.runtime.universe.TypeTag

/** ClickHouse signature analytics aggregates that Spark lacks,
  * as typed `Aggregator[IN,BUF,OUT]`s (SURVEY.md §2.4 "A" rows,
  * §2.10 UDAF surface): windowFunnel, sequenceMatch, topK.
  *
  * The funnel/sequence buffers collect the group's (ts, step) events
  * and order them only in `finish` — that makes `merge` plain
  * concatenation, trivially associative/commutative, which is the
  * partial-aggregation law Spark's two-phase agg relies on (property-
  * tested in AggregatorSpec). Buffers are bounded by events-per-user,
  * the same bound ClickHouse's implementation carries.
  */
object Aggregates {

  private def enc[T: TypeTag]: Encoder[T] = ExpressionEncoder[T]()

  /** Shared loud per-group cap for the collected-state aggregators
    * (MannWhitneyU, KolmogorovSmirnov, RankCorr, Lttb,
    * IntervalLengthSum): 2^24 collected values ≈ 256 MB of serialized
    * buffer for pair-state — past that a hot group silently spills or
    * OOMs an executor at scale, so fail with the bounded alternative
    * named instead (same pattern as QuantileExact's DoubleVec.MaxN and
    * LogRegFit's 1<<22 cap).
    */
  private[graft] val CollectCap: Int = 1 << 24

  private[graft] def capCheck(n: Int, fn: String, alt: String): Unit =
    require(n < CollectCap,
      s"$fn: group exceeds $CollectCap collected values — $alt")

  /** One funnel/sequence input: event time (µs) + matched step
    * (1-based; emit only step>0 rows).
    */
  case class StepEvent(tsUs: Long, step: Int)

  /** The windowFunnel DP, shared by the batch Aggregator and the
    * streaming mapGroupsWithState path (graft.streaming).
    */
  def funnelDepth(events: Seq[StepEvent], windowUs: Long, nSteps: Int): Int = {
    val sorted = events.sortBy(e => (e.tsUs, e.step))
    val none = Long.MinValue
    val best = Array.fill(nSteps + 1)(none)
    sorted.foreach { e =>
      if (e.step == 1) best(1) = math.max(best(1), e.tsUs)
      else if (e.step >= 2 && e.step <= nSteps &&
        best(e.step - 1) != none && e.tsUs - best(e.step - 1) <= windowUs)
        best(e.step) = math.max(best(e.step), best(e.step - 1))
    }
    var depth = 0
    var j = 1
    while (j <= nSteps && best(j) != none) { depth = j; j += 1 }
    depth
  }

  /** ClickHouse `windowFunnel(window)(ts, cond1..condN)`: the deepest
    * k such that SOME chain e1 ≤ … ≤ ek matches steps 1..k in order
    * with ts_k − ts_1 ≤ windowUs ("exists-chain" semantics, events
    * non-strictly ordered).
    *
    * finish() runs a DP over ts-sorted events keeping, per depth j,
    * the LATEST possible chain-start; a later start always dominates
    * (more window slack), so the scan is O(n·k) after the sort.
    */
  class WindowFunnel(windowUs: Long, nSteps: Int)
      extends Aggregator[StepEvent, Seq[StepEvent], Int] with Serializable {
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nSteps) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Int = funnelDepth(b, windowUs, nSteps)
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  /** Adapter from ClickHouse's `(timestamp, cond1..condN)` calling
    * convention onto the StepEvent aggregators, in a SQL-registrable
    * UDAF shape (ChSql's parametric rewrite registers these): a row
    * matching several conditions contributes one StepEvent per
    * matching condition, exactly like CH's per-condition expansion.
    * The buffer and all aggregation laws are the inner aggregator's —
    * this only translates the input row shape.
    */
  class CondsAdapter[OUT](inner: Aggregator[StepEvent, Seq[StepEvent], OUT],
      nConds: Int)
      extends Aggregator[(Long, Seq[Boolean]), Seq[StepEvent], OUT]
      with Serializable {
    def zero: Seq[StepEvent] = inner.zero
    def reduce(b: Seq[StepEvent], in: (Long, Seq[Boolean])): Seq[StepEvent] = {
      val conds = in._2
      var cur = b
      var i = 0
      val n = math.min(nConds, if (conds == null) 0 else conds.size)
      while (i < n) {
        if (conds(i)) cur = inner.reduce(cur, StepEvent(in._1, i + 1))
        i += 1
      }
      cur
    }
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] =
      inner.merge(a, b)
    def finish(b: Seq[StepEvent]): OUT = inner.finish(b)
    def bufferEncoder: Encoder[Seq[StepEvent]] = inner.bufferEncoder
    def outputEncoder: Encoder[OUT] = inner.outputEncoder
  }

  /** ClickHouse `sequenceMatch('(?1).*(?2)…')` for a linear pattern:
    * do events matching steps 1..N occur at STRICTLY increasing
    * timestamps? finish() greedily keeps the earliest achievable ts
    * per prefix length over the ts-sorted events.
    */
  class SequenceMatch(nSteps: Int)
      extends Aggregator[StepEvent, Seq[StepEvent], Boolean] with Serializable {
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nSteps) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Boolean = {
      val sorted = b.sortBy(e => (e.tsUs, e.step))
      val none = Long.MaxValue
      val earliest = Array.fill(nSteps + 1)(none)
      earliest(0) = Long.MinValue
      sorted.foreach { e =>
        if (earliest(e.step - 1) != none && earliest(e.step - 1) < e.tsUs &&
          e.tsUs < earliest(e.step))
          earliest(e.step) = e.tsUs
      }
      earliest(nSteps) != none
    }
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }

  /** ClickHouse `sequenceCount('(?1).*(?2)…')`: number of
    * NON-OVERLAPPING occurrences of the linear pattern in ts order.
    * finish() is the classic greedy earliest-completion scan, which
    * is optimal for maximizing disjoint matches (interval-scheduling
    * argument; property-tested against exhaustive search).
    */
  class SequenceCount(nSteps: Int)
      extends Aggregator[StepEvent, Seq[StepEvent], Long] with Serializable {
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nSteps) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Long = {
      var cur = 1
      var lastTs = Long.MinValue
      var n = 0L
      b.sortBy(e => (e.tsUs, e.step)).foreach { e =>
        if (e.step == cur && e.tsUs > lastTs) {
          lastTs = e.tsUs
          if (cur == nSteps) { n += 1; cur = 1 } else cur += 1
        }
      }
      n
    }
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** ClickHouse `sequenceMatch` with TIME-BOUND transitions — the
    * pattern dialect's `(?t<=N)` / `(?t>N)` conditions between steps
    * (e.g. `'(?1)(?t<=3600)(?2)'`), the most-used pattern feature in
    * product analytics. Matches "exists events e1 < … < eN at strictly
    * increasing timestamps, step i+1 within (minGap_i, maxGap_i] of
    * step i" (other events may interleave, like `.*`).
    *
    * `maxGapUs(i)` bounds ts_{i+2} − ts_{i+1} from above (`Long
    * .MaxValue` = unbounded, plain `.*`); `minGapUs(i)` strictly from
    * below (`(?t>N)`; −1 = none). Greedy earliest-per-prefix is NOT
    * sound under gap bounds (a later step-k occurrence can satisfy a
    * max-gap a sooner one misses), so finish() keeps ALL feasible
    * chain-end timestamps per prefix length — O(n²·k) worst case over
    * the per-group events, the same per-group bound ClickHouse's
    * pattern automaton carries.
    */
  class SequenceMatchTimed(nSteps: Int, maxGapUs: Seq[Long], minGapUs: Seq[Long])
      extends Aggregator[StepEvent, Seq[StepEvent], Boolean] with Serializable {
    require(maxGapUs.size == nSteps - 1 && minGapUs.size == nSteps - 1,
      s"need ${nSteps - 1} per-transition gap bounds")
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nSteps) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Boolean = {
      val sorted = b.sortBy(e => (e.tsUs, e.step))
      // ends(j): timestamps of all feasible chains of length j, in scan
      // (= ascending-ts) order.
      val ends = Array.fill(nSteps + 1)(scala.collection.mutable.ArrayBuffer.empty[Long])
      var matched = false
      val it = sorted.iterator
      while (it.hasNext && !matched) {
        val e = it.next()
        val ok =
          if (e.step == 1) true
          else {
            val maxG = maxGapUs(e.step - 2)
            val minG = minGapUs(e.step - 2)
            // feasible predecessor ts': strictly before e, within the
            // gap window: e.ts − ts' ≤ maxG  and  e.ts − ts' > minG.
            ends(e.step - 1).exists(t =>
              t < e.tsUs && e.tsUs - t <= maxG && e.tsUs - t > minG)
          }
        if (ok) {
          if (e.step == nSteps) matched = true
          else ends(e.step) += e.tsUs
        }
      }
      matched
    }
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }

  /** uniqTheta-style KMV sketch as an Aggregator (§2.4 -State family;
    * see [[Sketches]] for the estimator + set operations): the buffer
    * accumulates raw 60-bit hashes and compacts to the k smallest
    * distinct values only when it exceeds 4k — O(1) amortized per row,
    * O(k) state. Trimming a PARTIAL stream to its k-min set loses
    * nothing (k-min is a mergeable summary), so merge is plain concat
    * + lazy compact: associative/commutative under finish, Spark's
    * partial-aggregation law. Output: the sorted k-min hash array — a
    * storable, unionable sketch column (exact set algebra below
    * capacity; θ-scaled estimates above, ThetaSketchSpec).
    */
  class ThetaSketch(k: Int, seed: String = "th")
      extends Aggregator[String, Seq[Long], Array[Long]] with Serializable {
    require(k >= 2, s"theta sketch needs k >= 2, got $k")
    private def compact(b: Seq[Long]): Seq[Long] = b.distinct.sorted.take(k)
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], x: String): Seq[Long] = {
      // Vector: O(1) append AND O(1) length — a List buffer would make
      // both linear per row (quadratic per group). toVector is a no-op
      // on the hot path and one copy after a spill deserializes to a
      // different Seq runtime class.
      val nb = b.toVector :+ Sketches.hash60(seed, x)
      if (nb.length > 4 * k) compact(nb) else nb
    }
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = {
      val m = a ++ b
      if (m.length > 4 * k) compact(m) else m
    }
    def finish(b: Seq[Long]): Array[Long] = compact(b).toArray
    def bufferEncoder: Encoder[Seq[Long]] = enc[Seq[Long]]
    def outputEncoder: Encoder[Array[Long]] = enc[Array[Long]]
  }

  /** Parsed form of ClickHouse's sequenceMatch/sequenceCount pattern
    * DSL (`'(?1)(?t<=3600)(?2).*(?3)'`): `steps(j)` is the condition
    * number at chain position j; per transition j→j+1,
    * `maxGapUs`/`minGapUs` bound ts_{j+1} − ts_j (µs; MaxValue/−1 =
    * unbounded) and `contiguous` carries CH's skip rule — WITHOUT
    * `.*`, events matching ANY declared condition may not lie between
    * the two chain events (the documented `(?1)(?2)` vs `(?1).*(?2)`
    * distinction); undeclared events are always invisible.
    */
  case class SeqPattern(steps: IndexedSeq[Int], maxGapUs: IndexedSeq[Long],
      minGapUs: IndexedSeq[Long], contiguous: IndexedSeq[Boolean]) {
    def nPositions: Int = steps.length
  }

  object SeqPattern {
    private val token =
      """\(\?(\d+)\)|\(\?t\s*(<=|>=|==|<|>)\s*(\d+)\)|\.\*""".r

    /** Parse the CH pattern dialect; rejects anything outside it
      * loudly (unknown tokens, gap/`.*` with no step on both sides).
      */
    def parse(pattern: String): SeqPattern = {
      val steps = IndexedSeq.newBuilder[Int]
      val maxG = IndexedSeq.newBuilder[Long]
      val minG = IndexedSeq.newBuilder[Long]
      val contig = IndexedSeq.newBuilder[Boolean]
      var pendingMax = Long.MaxValue
      var pendingMin = -1L
      var pendingContig = true
      var pendingTrans = false // tokens seen since the last step
      var nSteps = 0
      var pos = 0
      for (m <- token.findAllMatchIn(pattern)) {
        require(pattern.substring(pos, m.start).trim.isEmpty,
          s"sequenceMatch pattern: unrecognized text " +
            s"'${pattern.substring(pos, m.start)}' in '$pattern'")
        pos = m.end
        if (m.group(1) != null) { // (?N)
          if (nSteps > 0) {
            maxG += pendingMax; minG += pendingMin; contig += pendingContig
          } else require(!pendingTrans,
            s"sequenceMatch pattern starts with a transition token: '$pattern'")
          require(m.group(1).toInt >= 1,
            s"sequenceMatch condition numbers are 1-based: '$pattern'")
          steps += m.group(1).toInt
          nSteps += 1
          pendingMax = Long.MaxValue; pendingMin = -1L
          pendingContig = true; pendingTrans = false
        } else if (m.group(2) != null) { // (?t op seconds)
          val us = m.group(3).toLong * 1000000L
          m.group(2) match {
            case "<=" => pendingMax = us
            case "<" => pendingMax = us - 1
            case ">" => pendingMin = us
            case ">=" => pendingMin = us - 1
            case "==" => pendingMax = us; pendingMin = us - 1
          }
          pendingTrans = true
        } else { // .*
          pendingContig = false
          pendingTrans = true
        }
      }
      require(pattern.substring(pos).trim.isEmpty,
        s"sequenceMatch pattern: unrecognized trailing text " +
          s"'${pattern.substring(pos)}' in '$pattern'")
      require(nSteps >= 1, s"sequenceMatch pattern has no (?N) steps: '$pattern'")
      require(!pendingTrans,
        s"sequenceMatch pattern ends with a dangling transition: '$pattern'")
      SeqPattern(steps.result(), maxG.result(), minG.result(), contig.result())
    }
  }

  /** The pattern-matching DP, shared by the Aggregator and the
    * brute-force property test: exists indices at strictly increasing
    * timestamps matching `p.steps` with every transition's gap and
    * contiguity constraint satisfied. All constraints are pairwise on
    * consecutive chain events, so the set of feasible chain-END
    * timestamps per prefix length is a complete state — O(n²·L) worst
    * case per group, the same bound the timed matcher carries.
    */
  def patternMatches(events: Seq[StepEvent], p: SeqPattern): Boolean =
    firstMatchEnd(events.filter(_.step >= 1)
      .sortBy(e => (e.tsUs, e.step)).toArray, p).isDefined

  /** Scan the ts-sorted declared events; return the timestamp of the
    * FIRST completing match (events are processed in ascending ts, so
    * this is the earliest possible completion) or None.
    */
  private def firstMatchEnd(sorted: Array[StepEvent], p: SeqPattern): Option[Long] = {
    if (sorted.isEmpty) return None
    val allTs: Array[Long] = sorted.map(_.tsUs) // declared events, sorted
    def declaredBetween(lo: Long, hi: Long): Boolean = {
      var l = 0; var r = allTs.length
      while (l < r) { val m = (l + r) >>> 1
        if (allTs(m) <= lo) l = m + 1 else r = m }
      l < allTs.length && allTs(l) < hi
    }
    val L = p.nPositions
    val ends = Array.fill(L + 1)(scala.collection.mutable.ArrayBuffer.empty[Long])
    var matchEnd: Option[Long] = None
    val it = sorted.iterator
    while (it.hasNext && matchEnd.isEmpty) {
      val e = it.next()
      // try every chain position this condition can fill, deepest
      // first (a position never feeds itself: predecessors are < e.ts)
      var j = L
      while (j >= 1 && matchEnd.isEmpty) {
        if (p.steps(j - 1) == e.step) {
          val ok =
            if (j == 1) true
            else {
              val maxG = p.maxGapUs(j - 2)
              val minG = p.minGapUs(j - 2)
              val needAdj = p.contiguous(j - 2)
              ends(j - 1).exists(t =>
                t < e.tsUs && e.tsUs - t <= maxG && e.tsUs - t > minG &&
                  (!needAdj || !declaredBetween(t, e.tsUs)))
            }
          if (ok) {
            if (j == L) matchEnd = Some(e.tsUs) else ends(j) += e.tsUs
          }
        }
        j -= 1
      }
    }
    matchEnd
  }

  /** sequenceCount semantics over the pattern DSL: GREEDY
    * non-overlapping matching — find the earliest-completing match,
    * then rescan only the events strictly after its end (CH's
    * automaton-reset counting; contiguity checks see only the
    * remaining stream, exactly as a rescan would). "Non-overlapping"
    * is the TIME-window sense: a later match must start after the
    * previous one ENDS. Among such time-disjoint matches,
    * earliest-completion repetition is maximal (interval scheduling);
    * property-tested against SequenceCount on linear `.*` patterns.
    */
  def patternCountNonOverlap(events: Seq[StepEvent], p: SeqPattern): Long = {
    var remaining = events.filter(_.step >= 1)
      .sortBy(e => (e.tsUs, e.step)).toArray
    var cnt = 0L
    var go = true
    while (go) firstMatchEnd(remaining, p) match {
      case Some(end) =>
        cnt += 1
        remaining = remaining.filter(_.tsUs > end)
      case None => go = false
    }
    cnt
  }

  /** ClickHouse `sequenceCount('<pattern>')(ts, cond1…condN)` driven
    * by the verbatim pattern string (see [[SequenceMatchPattern]] for
    * the input contract).
    */
  class SequenceCountPattern(pattern: String, nConds: Int = -1)
      extends Aggregator[StepEvent, Seq[StepEvent], Long] with Serializable {
    private val p = SeqPattern.parse(pattern)
    private val nc = if (nConds > 0) nConds else p.steps.max
    require(nc >= p.steps.max,
      s"pattern '$pattern' references condition ${p.steps.max} but only $nc declared")
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nc) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Long = patternCountNonOverlap(b, p)
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** ClickHouse `sequenceMatch('<pattern>')(ts, cond1…condN)` driven
    * by the VERBATIM pattern string — the DSL front door over the
    * timed/contiguity machinery. Input rows carry the matched
    * condition number (1-based; undeclared events need not be fed —
    * they are invisible to the pattern). `nConds` is the number of
    * declared condition args: conditions not used by the pattern
    * still interrupt adjacent (non-`.*`) transitions, exactly CH's
    * documented no-skip rule.
    */
  class SequenceMatchPattern(pattern: String, nConds: Int = -1)
      extends Aggregator[StepEvent, Seq[StepEvent], Boolean] with Serializable {
    private val p = SeqPattern.parse(pattern)
    private val nc = if (nConds > 0) nConds else p.steps.max
    require(nc >= p.steps.max,
      s"pattern '$pattern' references condition ${p.steps.max} but only $nc declared")
    def zero: Seq[StepEvent] = Nil
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nc) b :+ e else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Boolean = patternMatches(b, p)
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Boolean] = Encoders.scalaBoolean
  }

  /** ClickHouse `windowFunnel(window, 'strict_increase'|'strict_order'|
    * 'strict_dedup')`: the funnel modes, in their DECLARATIVE reading —
    * depth k iff there EXISTS a chain e1…ek matching steps 1..k at
    * non-decreasing timestamps with ts_j − ts_1 ≤ window at every
    * prefix, where additionally
    *   - strictIncrease: chain timestamps strictly increase;
    *   - strictOrder:    no event of ANY kind (step 0 interrupters
    *                     included) lies at a timestamp strictly between
    *                     consecutive chain events — the chain is
    *                     contiguous in the user's event stream;
    *   - strictDedup:    no event matching an ALREADY-SATISFIED
    *                     condition (step ≤ j) lies strictly between
    *                     chain events e_j and e_{j+1} — a repeat of a
    *                     met condition interrupts.
    * ClickHouse's single-pass scan keeps one candidate chain per depth
    * and so can miss interleaved solutions the declarative semantics
    * admit; the exists-chain reading is order-insensitive, which is
    * what lets a relational DuckDB oracle restate it exactly.
    *
    * finish() runs the maxStart DP: per (depth j, event i) keep the
    * MAXIMUM chain-start timestamp over valid chains of length j ending
    * at i — the window check ts_i − start ≤ W is monotone in start, and
    * the mode constraints are pairwise on consecutive events, so the
    * max-start chain dominates. O(n²·k) per group over the ts-sorted
    * events, the same per-group bound the un-moded funnel's DP carries.
    */
  class WindowFunnelModes(windowUs: Long, nSteps: Int,
      strictOrder: Boolean = false, strictDedup: Boolean = false,
      strictIncrease: Boolean = false)
      extends Aggregator[StepEvent, Seq[StepEvent], Int] with Serializable {
    def zero: Seq[StepEvent] = Nil
    // step-0 events matter only as strict_order interrupters — don't
    // buffer them otherwise (bounded buffers at scale).
    def reduce(b: Seq[StepEvent], e: StepEvent): Seq[StepEvent] =
      if (e.step >= 1 && e.step <= nSteps) b :+ e
      else if (e.step == 0 && strictOrder) b :+ e
      else b
    def merge(a: Seq[StepEvent], b: Seq[StepEvent]): Seq[StepEvent] = a ++ b
    def finish(b: Seq[StepEvent]): Int = {
      val ev = b.sortBy(e => (e.tsUs, e.step)).toArray
      val n = ev.length
      if (n == 0) return 0
      val allTs: Array[Long] = ev.map(_.tsUs)
      // per-step sorted timestamps for the dedup betweenness check
      val tsByStep: Array[Array[Long]] =
        Array.tabulate(nSteps + 1)(s => ev.filter(_.step == s).map(_.tsUs))
      def anyIn(sorted: Array[Long], lo: Long, hi: Long): Boolean = {
        // exists t with lo < t < hi
        var l = 0; var r = sorted.length
        while (l < r) { val m = (l + r) >>> 1
          if (sorted(m) <= lo) l = m + 1 else r = m }
        l < sorted.length && sorted(l) < hi
      }
      val none = Long.MinValue
      // maxStart(i) for the current depth; rolled per level
      var cur = Array.tabulate(n)(i => if (ev(i).step == 1) ev(i).tsUs else none)
      var depth = if (cur.exists(_ != none)) 1 else 0
      var j = 2
      while (j <= nSteps && depth == j - 1) {
        val next = Array.fill(n)(none)
        var i = 0
        while (i < n) {
          if (ev(i).step == j) {
            var m = 0
            var best = none
            while (m < n) {
              if (ev(m).step == j - 1 && cur(m) != none) {
                val ok =
                  (if (strictIncrease) ev(m).tsUs < ev(i).tsUs
                   else ev(m).tsUs <= ev(i).tsUs) &&
                  ev(i).tsUs - cur(m) <= windowUs &&
                  (!strictOrder || !anyIn(allTs, ev(m).tsUs, ev(i).tsUs)) &&
                  (!strictDedup || !(1 until j).exists(s =>
                    anyIn(tsByStep(s), ev(m).tsUs, ev(i).tsUs)))
                if (ok && cur(m) > best) best = cur(m)
              }
              m += 1
            }
            next(i) = best
          }
          i += 1
        }
        if (next.exists(_ != none)) depth = j
        cur = next
        j += 1
      }
      depth
    }
    def bufferEncoder: Encoder[Seq[StepEvent]] = enc[Seq[StepEvent]]
    def outputEncoder: Encoder[Int] = Encoders.scalaInt
  }

  case class Bin(lower: Double, upper: Double, height: Double)

  /** ClickHouse `histogram(n)`: adaptive-binning histogram via
    * streaming centroid merge (the classic streaming-histogram
    * algorithm CH uses): keep ≤ maxBins (center, count) centroids,
    * merging the closest pair on overflow. Approximate and
    * merge-order-sensitive by nature (like CH's); the tests pin the
    * invariants that ARE guaranteed: bin count ≤ n, total mass
    * preserved, bins ordered and bounded by the data range.
    */
  class AdaptiveHistogram(maxBins: Int)
      extends Aggregator[Double, Seq[(Double, Long)], Seq[Bin]] with Serializable {
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], x: Double): Seq[(Double, Long)] =
      compact((b :+ (x, 1L)).sortBy(_._1))
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      compact((a ++ b).sortBy(_._1))
    private def compact(sorted: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      // coalesce identical centers first (a centroid per distinct value)
      var bins = sorted.foldLeft(Vector.empty[(Double, Long)]) {
        case (acc :+ ((c, n)), (c2, n2)) if c == c2 => acc :+ (c, n + n2)
        case (acc, b) => acc :+ b
      }
      while (bins.size > maxBins) {
        val i = bins.indices.init.minBy(j => bins(j + 1)._1 - bins(j)._1)
        val (c1, n1) = bins(i); val (c2, n2) = bins(i + 1)
        val merged = ((c1 * n1 + c2 * n2) / (n1 + n2), n1 + n2)
        bins = (bins.take(i) :+ merged) ++ bins.drop(i + 2)
      }
      bins
    }
    def finish(b: Seq[(Double, Long)]): Seq[Bin] =
      b.indices.map { i =>
        val lo = if (i == 0) b(i)._1 else (b(i - 1)._1 + b(i)._1) / 2
        val hi = if (i == b.size - 1) b(i)._1 else (b(i)._1 + b(i + 1)._1) / 2
        Bin(lo, hi, b(i)._2.toDouble)
      }
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = enc[Seq[(Double, Long)]]
    def outputEncoder: Encoder[Seq[Bin]] = enc[Seq[Bin]]
  }

  case class Counted(v: String, c: Long)

  /** ClickHouse `topK(k)`: heavy hitters via the SpaceSaving sketch
    * with `capacity` counters. Exact whenever the group's distinct
    * count ≤ capacity (which the declared query guarantees, keeping it
    * oracle-checkable); approximate with the classic SpaceSaving error
    * bound otherwise. Deterministic eviction: smallest count, then
    * lexicographic value.
    */
  class TopK(k: Int, capacity: Int)
      extends Aggregator[String, Map[String, Long], Seq[Counted]] with Serializable {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], v: String): Map[String, Long] = bump(b, v, 1L)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (v, c)) => bump(m, v, c) }
    private def bump(b: Map[String, Long], v: String, by: Long): Map[String, Long] =
      if (b.contains(v) || b.size < capacity)
        b.updatedWith(v)(c => Some(c.getOrElse(0L) + by))
      else { // SpaceSaving: the new item takes over the smallest counter
        val (ev, minC) = b.minBy { case (value, c) => (c, value) }
        (b - ev).updated(v, minC + by)
      }
    def finish(b: Map[String, Long]): Seq[Counted] =
      b.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
        .map { case (v, c) => Counted(v, c) }
    def bufferEncoder: Encoder[Map[String, Long]] = enc[Map[String, Long]]
    def outputEncoder: Encoder[Seq[Counted]] = enc[Seq[Counted]]
  }

  /** One weighted heavy-hitter input: value + its weight (bytes,
    * revenue, quantity…).
    */
  case class Weighted(v: String, w: Long)

  /** ClickHouse `topKWeighted(k)(x, weight)`: heavy hitters by TOTAL
    * WEIGHT via weighted SpaceSaving — the commoner production form
    * (top pages by bytes, top products by revenue). Exact whenever the
    * group's distinct count ≤ capacity (the declared query guarantees
    * it, keeping the exact groupBy/sum oracle applicable); otherwise
    * the classic SpaceSaving overestimate bound scaled by total weight.
    * Deterministic eviction: smallest weight, then lexicographic value.
    */
  class TopKWeighted(k: Int, capacity: Int)
      extends Aggregator[Weighted, Map[String, Long], Seq[Counted]] with Serializable {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], x: Weighted): Map[String, Long] =
      bump(b, x.v, x.w)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (v, c)) => bump(m, v, c) }
    private def bump(b: Map[String, Long], v: String, by: Long): Map[String, Long] =
      if (b.contains(v) || b.size < capacity)
        b.updatedWith(v)(c => Some(c.getOrElse(0L) + by))
      else {
        val (ev, minC) = b.minBy { case (value, c) => (c, value) }
        (b - ev).updated(v, minC + by)
      }
    def finish(b: Map[String, Long]): Seq[Counted] =
      b.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
        .map { case (v, c) => Counted(v, c) }
    def bufferEncoder: Encoder[Map[String, Long]] = enc[Map[String, Long]]
    def outputEncoder: Encoder[Seq[Counted]] = enc[Seq[Counted]]
  }

  /** ClickHouse `uniqUpTo(N)(x)`: exact distinct count while the
    * group holds ≤ N distinct values, saturating at N+1 beyond
    * [public docs: aggregate-functions/parametric-functions#uniqupto].
    * State is a value set HARD-CAPPED at N+1 entries — once saturated
    * nothing more is inserted, so buffers are O(N) regardless of
    * group size (CH's exact contract). The point of this Aggregator
    * over `least(count(DISTINCT x), N+1)` is the PLAN: count(DISTINCT)
    * forces Spark's two-level Expand expansion (extra exchange +
    * whole-row regroup), while this is a plain TypedImperative
    * aggregate that fuses into the SAME ObjectHashAggregate pass as
    * percentile-family neighbours — one partial, one exchange, one
    * final. NULL inputs are ignored (count-DISTINCT semantics, which
    * the DuckDB oracle shares).
    */
  class UniqUpTo(n: Int)
      extends Aggregator[String, Set[String], Long] with Serializable {
    private val cap = n + 1
    def zero: Set[String] = Set.empty
    def reduce(b: Set[String], v: String): Set[String] =
      if (v == null || b.size >= cap || b.contains(v)) b else b + v
    def merge(a: Set[String], b: Set[String]): Set[String] = {
      // union, stopping as soon as the cap is reached — saturation is
      // absorbing, so any cap-sized union yields the same N+1 result
      var m = a
      val it = b.iterator
      while (m.size < cap && it.hasNext) m += it.next()
      if (m.size > cap) m.take(cap) else m
    }
    def finish(b: Set[String]): Long = math.min(b.size.toLong, cap.toLong)
    def bufferEncoder: Encoder[Set[String]] = enc[Set[String]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** ClickHouse `groupBitmap` (roaring-bitmap distinct count): keyed
    * bitmap containers — values bucket by `v >> 12` into 4096-bit
    * (64-word) containers, the same two-level shape Roaring uses for
    * its dense case. reduce sets one bit; merge is word-wise OR
    * (associative/commutative — the partial-agg law); finish popcounts.
    * EXACT at any cardinality and any executor count, with buffers
    * proportional to the value-range coverage, not the row count —
    * the reason ClickHouse users reach for bitmaps over uniqExact at
    * scale. Negative values supported (bucket floor-division).
    */
  class GroupBitmap
      extends Aggregator[Long, Map[Long, Array[Long]], Long] with Serializable {
    private def bucket(v: Long): Long = v >> 12 // container id (floor for negatives)
    private def bit(v: Long): Int = (v & 4095L).toInt
    def zero: Map[Long, Array[Long]] = Map.empty
    // The buffer is partition-private between serialization points, so
    // containers are mutated IN PLACE — no 512-byte clone per row; the
    // immutable Map only changes when a new container appears.
    def reduce(b: Map[Long, Array[Long]], v: Long): Map[Long, Array[Long]] =
      b.get(bucket(v)) match {
        case Some(words) =>
          words(bit(v) >> 6) |= 1L << (bit(v) & 63)
          b
        case None =>
          val words = new Array[Long](64)
          words(bit(v) >> 6) |= 1L << (bit(v) & 63)
          b.updated(bucket(v), words)
      }
    def merge(a: Map[Long, Array[Long]], b: Map[Long, Array[Long]]): Map[Long, Array[Long]] =
      b.foldLeft(a) { case (m, (k, words)) =>
        m.get(k) match {
          case None => m.updated(k, words)
          case Some(mine) =>
            var i = 0
            while (i < 64) { mine(i) |= words(i); i += 1 }
            m
        }
      }
    def finish(b: Map[Long, Array[Long]]): Long =
      b.valuesIterator.map(ws => ws.map(java.lang.Long.bitCount(_).toLong).sum).sum
    def bufferEncoder: Encoder[Map[Long, Array[Long]]] = enc[Map[Long, Array[Long]]]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** One t-digest centroid: mean + count. */
  case class Centroid(mean: Double, count: Long)

  /** ClickHouse `quantileTDigest`: a MERGEABLE quantile sketch (the
    * merging t-digest of Dunning & Ertl, "Computing extremely accurate
    * quantiles using t-digests", arXiv:1902.04023). The buffer is a
    * mean-sorted centroid list compacted under the k1-style size bound
    * count(c) ≤ max(1, 4·N·q(1−q)/δ) — tight at the tails (accurate
    * extreme quantiles), loose in the middle, which is the whole trick.
    *
    * Size is O(δ) regardless of N, so partial aggregation ships tiny
    * buffers at any scale; `merge` concat+compacts, associative up to
    * the sketch's own approximation (like ClickHouse's). Accuracy is
    * pinned by rank-error tests in ApproxSpec — by nature it cannot be
    * hash-checked against an exact oracle.
    */
  class TDigestQuantiles(qs: Seq[Double], delta: Int = 100)
      extends Aggregator[Double, Seq[Centroid], Seq[Double]] with Serializable {
    def zero: Seq[Centroid] = Nil
    def reduce(b: Seq[Centroid], x: Double): Seq[Centroid] = {
      val appended = b :+ Centroid(x, 1L)
      // Lazy compaction: amortize the sort (classic merging-digest
      // buffering) instead of compressing per row.
      if (appended.size > 8 * delta) compact(appended) else appended
    }
    def merge(a: Seq[Centroid], b: Seq[Centroid]): Seq[Centroid] = compact(a ++ b)
    private def compact(cs: Seq[Centroid]): Seq[Centroid] = {
      if (cs.size <= 1) return cs
      val sorted = cs.sortBy(c => (c.mean, c.count))
      val total = sorted.iterator.map(_.count).sum
      val out = scala.collection.mutable.ArrayBuffer.empty[Centroid]
      var cm = sorted.head.mean
      var cn = sorted.head.count
      var before = 0L // mass strictly before the current centroid
      sorted.tail.foreach { c =>
        val q = (before + (cn + c.count) / 2.0) / total
        val limit = math.max(1.0, 4.0 * total * q * (1 - q) / delta)
        if (cn + c.count <= limit) {
          cm = (cm * cn + c.mean * c.count) / (cn + c.count)
          cn += c.count
        } else {
          out += Centroid(cm, cn); before += cn
          cm = c.mean; cn = c.count
        }
      }
      out += Centroid(cm, cn)
      out.toSeq
    }
    def finish(b: Seq[Centroid]): Seq[Double] = {
      val cs = compact(b)
      if (cs.isEmpty) return qs.map(_ => Double.NaN)
      val total = cs.iterator.map(_.count).sum.toDouble
      // Cumulative mid-point ranks, linear interpolation between them.
      val mids = cs.scanLeft(0.0)((acc, c) => acc + c.count)
        .zip(cs).map { case (before, c) => (before + c.count / 2.0, c.mean) }
      qs.map { q =>
        val target = q * total
        if (target <= mids.head._1) cs.head.mean
        else if (target >= mids.last._1) cs.last.mean
        else {
          val i = mids.lastIndexWhere(_._1 <= target)
          val (r0, m0) = mids(i); val (r1, m1) = mids(i + 1)
          m0 + (m1 - m0) * ((target - r0) / (r1 - r0))
        }
      }
    }
    def bufferEncoder: Encoder[Seq[Centroid]] = enc[Seq[Centroid]]
    def outputEncoder: Encoder[Seq[Double]] = enc[Seq[Double]]
  }

  /** DDSketch state: log-bucket counts for positive and (mirrored)
    * negative values plus an exact zero count.
    */
  case class DDState(pos: Map[Int, Long], neg: Map[Int, Long], zero: Long)

  /** ClickHouse `quantileDD(relative_accuracy[, level…])` — the
    * DDSketch quantile (Masson, Rim & Lee, "DDSketch: a fast and
    * fully-mergeable quantile sketch with relative-error guarantees",
    * VLDB 2019). Bucket ⌈ln|x| / ln γ⌉ with γ = (1+α)/(1−α), mirrored
    * store for negatives, exact zero count; the level-q answer is the
    * first bucket in ascending VALUE order whose cumulative count
    * exceeds q·(n−1), estimated as ±2γ^i/(γ+1) (relative error ≤ α by
    * construction — spec-proven in ApproxSpec). Unlike t-digest the
    * state is a pure function of the value MULTISET (deterministic,
    * order- and partitioning-independent), so the agg_quantile_dd
    * gate entry hash-checks a full DuckDB re-derivation of the sketch.
    * State is O(log(max/min)/log γ) buckets regardless of row count —
    * partial aggregation ships tiny maps at any scale.
    */
  class DDSketchQuantiles(relAcc: Double, qs: Seq[Double])
      extends Aggregator[Double, DDState, Seq[Double]] with Serializable {
    require(relAcc > 0.0 && relAcc < 1.0,
      s"quantileDD: relative accuracy $relAcc out of (0, 1)")
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantileDD: levels $qs out of [0, 1]")
    private val gamma = (1.0 + relAcc) / (1.0 - relAcc)
    private val lnG = math.log(gamma)
    private def bump(m: Map[Int, Long], i: Int): Map[Int, Long] =
      m.updated(i, m.getOrElse(i, 0L) + 1L)
    def zero: DDState = DDState(Map.empty, Map.empty, 0L)
    def reduce(b: DDState, x: Double): DDState =
      if (x > 0.0) b.copy(pos = bump(b.pos, math.ceil(math.log(x) / lnG).toInt))
      else if (x < 0.0) b.copy(neg = bump(b.neg, math.ceil(math.log(-x) / lnG).toInt))
      else if (x == 0.0) b.copy(zero = b.zero + 1L)
      else b // NaN carries no rank information
    def merge(a: DDState, b: DDState): DDState = DDState(
      b.pos.foldLeft(a.pos) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c) },
      b.neg.foldLeft(a.neg) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c) },
      a.zero + b.zero)
    private def value(i: Int): Double = 2.0 * math.pow(gamma, i) / (gamma + 1.0)
    def finish(b: DDState): Seq[Double] = {
      val n = b.pos.valuesIterator.sum + b.neg.valuesIterator.sum + b.zero
      if (n == 0L) return qs.map(_ => Double.NaN)
      // ascending value order: negatives by DESCENDING index (larger
      // magnitude = smaller value), the zero bucket, positives ascending
      val entries: IndexedSeq[(Double, Long)] =
        (b.neg.toIndexedSeq.sortBy(-_._1).map { case (i, c) => (-value(i), c) } ++
          (if (b.zero > 0L) IndexedSeq((0.0, b.zero)) else IndexedSeq.empty) ++
          b.pos.toIndexedSeq.sortBy(_._1).map { case (i, c) => (value(i), c) })
      qs.map { q =>
        val rank = q * (n - 1).toDouble
        var cum = 0L
        var k = 0
        var ans = entries.last._1
        var done = false
        while (k < entries.length && !done) {
          cum += entries(k)._2
          if (cum > rank) { ans = entries(k)._1; done = true }
          k += 1
        }
        ans
      }
    }
    def bufferEncoder: Encoder[DDState] = enc[DDState]
    def outputEncoder: Encoder[Seq[Double]] = enc[Seq[Double]]
  }

  /** CH sumMap/minMap/maxMap [public docs: sql-reference/
    * aggregate-functions/reference/summap]: per-key aggregation of
    * parallel key/value arrays across rows; the result is the
    * (sorted keys, aggregated values) pair CH prints. Keys are
    * normalized to DOUBLE (CH's dominant numeric-key use; string-keyed
    * maps fail loudly at analysis instead of silently casting).
    * Buffer is a hash map keyed by the key value, so the state is
    * O(distinct keys), not O(rows).
    */
  class MapCombine(op: String)
      extends Aggregator[(Seq[Double], Seq[Double]), Map[Double, Double],
        (Seq[Double], Seq[Double])] with Serializable {
    require(Set("sum", "min", "max")(op), s"MapCombine: bad op $op")
    private def comb(a: Double, b: Double): Double = op match {
      case "min" => math.min(a, b)
      case "max" => math.max(a, b)
      case _ => a + b
    }
    def zero: Map[Double, Double] = Map.empty
    def reduce(b: Map[Double, Double],
        x: (Seq[Double], Seq[Double])): Map[Double, Double] =
      if (x == null || x._1 == null || x._2 == null) b
      else {
        require(x._1.length == x._2.length,
          s"${op}Map: keys(${x._1.length}) and values(${x._2.length}) differ")
        x._1.zip(x._2).foldLeft(b) { case (m, (k, v)) =>
          m.updatedWith(k)(c => Some(c.fold(v)(comb(_, v))))
        }
      }
    def merge(a: Map[Double, Double],
        b: Map[Double, Double]): Map[Double, Double] =
      b.foldLeft(a) { case (m, (k, v)) =>
        m.updatedWith(k)(c => Some(c.fold(v)(comb(_, v))))
      }
    def finish(r: Map[Double, Double]): (Seq[Double], Seq[Double]) = {
      val sorted = r.toSeq.sortBy(_._1)
      (sorted.map(_._1), sorted.map(_._2))
    }
    def bufferEncoder: Encoder[Map[Double, Double]] = enc[Map[Double, Double]]
    def outputEncoder: Encoder[(Seq[Double], Seq[Double])] =
      enc[(Seq[Double], Seq[Double])]
  }

  /** CH `exponentialMovingAverage(halflife)(value, time)` [public
    * docs: sql-reference/aggregate-functions/reference/
    * exponentialmovingaverage]: each value weighted by
    * 2^((t − t_latest)/halflife), result = Σ v·w / Σ w. The buffer
    * keeps (Σw, Σv·w, t_anchor) with weights anchored at the max time
    * SEEN IN THAT PARTIAL; merge re-anchors both sides at the newer
    * anchor by scaling with 2^((t_a − T)/h) — order-independent and
    * numerically safe (scales are always ≤ 1, no 2^epoch blowup).
    */
  class ExpMovingAvg(halflife: Double)
      extends Aggregator[(Double, Double), (Double, Double, Double), Double]
      with Serializable {
    require(halflife > 0, s"exponentialMovingAverage: halflife must be > 0")
    def zero: (Double, Double, Double) = (0.0, 0.0, Double.NegativeInfinity)
    private def merge2(a: (Double, Double, Double),
        b: (Double, Double, Double)): (Double, Double, Double) = {
      if (a._1 == 0.0) return b
      if (b._1 == 0.0) return a
      val t = math.max(a._3, b._3)
      val fa = math.pow(2.0, (a._3 - t) / halflife)
      val fb = math.pow(2.0, (b._3 - t) / halflife)
      (a._1 * fa + b._1 * fb, a._2 * fa + b._2 * fb, t)
    }
    def reduce(b: (Double, Double, Double),
        x: (Double, Double)): (Double, Double, Double) =
      merge2(b, (1.0, x._1, x._2))
    def merge(a: (Double, Double, Double),
        b: (Double, Double, Double)): (Double, Double, Double) = merge2(a, b)
    def finish(r: (Double, Double, Double)): Double = r._2 / r._1
    def bufferEncoder: Encoder[(Double, Double, Double)] =
      enc[(Double, Double, Double)]
    def outputEncoder: Encoder[Double] = enc[Double]
  }

  /** CH's `-ForEach` aggregate combinator [public docs: sql-reference/
    * aggregate-functions/combinators#-foreach]: apply the aggregate
    * ELEMENTWISE across rows at each array position. Output length =
    * the longest input array; positions a shorter array doesn't reach
    * simply contribute nothing there (CH semantics). Buffer is
    * (values, counts) per position so `avg` shares the class; sums of
    * integral inputs stay exact in double (< 2^53), so results are
    * partition-order independent for the integral inputs the oracle
    * checks. Registered by ChDialect as sum/min/max/avgForEach;
    * countForEach is a macro over sumForEach of indicator arrays.
    */
  class ForEachNum(op: String)
      extends Aggregator[Seq[Double], (Array[Double], Array[Long]), Seq[Double]]
      with Serializable {
    require(Set("sum", "min", "max", "avg")(op), s"ForEachNum: bad op $op")
    def zero: (Array[Double], Array[Long]) = (Array.emptyDoubleArray, Array.emptyLongArray)
    private def comb(a: Double, b: Double): Double = op match {
      case "min" => math.min(a, b)
      case "max" => math.max(a, b)
      case _ => a + b // sum and avg both accumulate sums
    }
    // The buffer arrays are MUTATED in place (grown only when a longer
    // input row arrives) — the per-row Seq rebuilds dominated this
    // UDAF's cost in the bench before.
    def reduce(b: (Array[Double], Array[Long]),
        x: Seq[Double]): (Array[Double], Array[Long]) = {
      if (x == null) return b
      val n = x.length
      val (v, c) =
        if (b._1.length >= n) b
        else (java.util.Arrays.copyOf(b._1, n), java.util.Arrays.copyOf(b._2, n))
      var i = 0
      while (i < n) {
        v(i) = if (c(i) > 0L) comb(v(i), x(i)) else x(i)
        c(i) += 1L
        i += 1
      }
      (v, c)
    }
    def merge(a: (Array[Double], Array[Long]),
        b: (Array[Double], Array[Long])): (Array[Double], Array[Long]) = {
      val (big, small) = if (a._1.length >= b._1.length) (a, b) else (b, a)
      val (v, c) = big
      var i = 0
      while (i < small._1.length) {
        if (c(i) > 0L && small._2(i) > 0L) v(i) = comb(v(i), small._1(i))
        else if (small._2(i) > 0L) v(i) = small._1(i)
        c(i) += small._2(i)
        i += 1
      }
      (v, c)
    }
    def finish(r: (Array[Double], Array[Long])): Seq[Double] =
      if (op == "avg")
        r._1.toIndexedSeq.zip(r._2).map { case (s, c) => s / c }
      else r._1.toIndexedSeq
    def bufferEncoder: Encoder[(Array[Double], Array[Long])] =
      enc[(Array[Double], Array[Long])]
    def outputEncoder: Encoder[Seq[Double]] = enc[Seq[Double]]
  }

  /** ClickHouse `mannWhitneyUTest([alternative[, continuity]])(x, i)`
    * over sample index 0/1: rank-sum U for the FIRST sample with
    * average-rank ties, tie-corrected normal σ, optional continuity
    * correction, and the p-value for the chosen alternative
    * [published MWW formulas; same algebra the relational
    * `agg_mann_whitney` entry proves against DuckDB]. State is the
    * group's raw values per sample (concat merge — the two-phase law);
    * the single sort + merge-rank happens in finish.
    */
  class MannWhitneyU(alternative: String = "two-sided",
      continuity: Boolean = true)
      extends Aggregator[(Double, Long), (Vector[Double], Vector[Double]),
        (Double, Double)] with Serializable {
    require(Seq("two-sided", "greater", "less").contains(alternative),
      s"mannWhitneyUTest: unknown alternative '$alternative'")
    private def mwCap(n: Int): Unit = capCheck(n, "mannWhitneyUTest",
      "sample the group or use meanZTest (moment-based, O(1) state)")
    def zero: (Vector[Double], Vector[Double]) = (Vector.empty, Vector.empty)
    def reduce(b: (Vector[Double], Vector[Double]), in: (Double, Long)):
        (Vector[Double], Vector[Double]) = {
      mwCap(b._1.size + b._2.size)
      if (in._2 == 0L) (b._1 :+ in._1, b._2) else (b._1, b._2 :+ in._1)
    }
    def merge(a: (Vector[Double], Vector[Double]),
        b: (Vector[Double], Vector[Double])): (Vector[Double], Vector[Double]) = {
      mwCap(a._1.size + a._2.size + b._1.size + b._2.size - 1)
      (a._1 ++ b._1, a._2 ++ b._2)
    }
    // Abramowitz & Stegun 7.1.26 erf (|err| < 1.5e-7), for Φ tails
    private def erfAS(x0: Double): Double = {
      val sign = if (x0 < 0) -1.0 else 1.0
      val x = math.abs(x0)
      val t = 1.0 / (1.0 + 0.3275911 * x)
      val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
        * t - 0.284496736) * t + 0.254829592) * t * math.exp(-x * x)
      sign * y
    }
    private def normSf(z: Double): Double = 0.5 * (1.0 - erfAS(z / math.sqrt(2.0)))
    def finish(b: (Vector[Double], Vector[Double])): (Double, Double) = {
      val (xs, ys) = b
      val n0 = xs.size.toDouble; val n1 = ys.size.toDouble
      if (n0 == 0 || n1 == 0) return (Double.NaN, Double.NaN)
      val all = (xs.map((_, 0)) ++ ys.map((_, 1))).sortBy(_._1)
      // average ranks with ties; accumulate first-sample rank sum and
      // the tie term Σ(t³ − t)
      var i = 0; var r0 = 0.0; var ties = 0.0
      val n = all.size
      while (i < n) {
        var j = i
        while (j + 1 < n && all(j + 1)._1 == all(i)._1) j += 1
        val t = (j - i + 1).toDouble
        val avgRank = (i + 1 + j + 1) / 2.0
        var k = i
        while (k <= j) { if (all(k)._2 == 0) r0 += avgRank; k += 1 }
        if (t > 1) ties += t * t * t - t
        i = j + 1
      }
      val u = r0 - n0 * (n0 + 1) / 2.0
      val mu = n0 * n1 / 2.0
      val sigma = math.sqrt(n0 * n1 / 12.0 *
        ((n0 + n1 + 1) - ties / ((n0 + n1) * (n0 + n1 - 1))))
      val cc = if (continuity) 0.5 else 0.0
      val p = alternative match {
        case "two-sided" =>
          val z = (math.abs(u - mu) - cc) / sigma
          math.min(1.0, 2.0 * normSf(math.max(0.0, z)))
        case "greater" => normSf((u - mu - cc) / sigma)
        case "less" => 1.0 - normSf((u - mu + cc) / sigma)
      }
      (u, p)
    }
    def bufferEncoder: Encoder[(Vector[Double], Vector[Double])] =
      enc[(Vector[Double], Vector[Double])]
    def outputEncoder: Encoder[(Double, Double)] = enc[(Double, Double)]
  }

  /** ClickHouse `kolmogorovSmirnovTest([alternative[, method]])(x, i)`
    * over sample index 0/1: two-sample D statistic (max ECDF gap via
    * one sort + a two-pointer sweep) and the asymptotic Kolmogorov
    * p-value Q(λ) = 2·Σ (−1)^{k−1} e^{−2k²λ²} with the
    * finite-sample λ refinement [Numerical Recipes §14.3 probks —
    * public]. Same collected-state shape as MannWhitneyU.
    */
  class KolmogorovSmirnov(alternative: String = "two-sided")
      extends Aggregator[(Double, Long), (Vector[Double], Vector[Double]),
        (Double, Double)] with Serializable {
    require(alternative == "two-sided",
      "kolmogorovSmirnovTest: only 'two-sided' is supported")
    private def ksCap(n: Int): Unit = capCheck(n, "kolmogorovSmirnovTest",
      "sample the group or compare t-digest quantile sketches (quantileTDigest)")
    def zero: (Vector[Double], Vector[Double]) = (Vector.empty, Vector.empty)
    def reduce(b: (Vector[Double], Vector[Double]), in: (Double, Long)):
        (Vector[Double], Vector[Double]) = {
      ksCap(b._1.size + b._2.size)
      if (in._2 == 0L) (b._1 :+ in._1, b._2) else (b._1, b._2 :+ in._1)
    }
    def merge(a: (Vector[Double], Vector[Double]),
        b: (Vector[Double], Vector[Double])): (Vector[Double], Vector[Double]) = {
      ksCap(a._1.size + a._2.size + b._1.size + b._2.size - 1)
      (a._1 ++ b._1, a._2 ++ b._2)
    }
    private def probks(lambda: Double): Double = {
      var sum = 0.0; var sign = 1.0
      var k = 1
      var term = 0.0
      do {
        term = sign * 2.0 * math.exp(-2.0 * k * k * lambda * lambda)
        sum += term
        sign = -sign
        k += 1
      } while (math.abs(term) > 1e-12 && k < 200)
      math.max(0.0, math.min(1.0, sum))
    }
    def finish(b: (Vector[Double], Vector[Double])): (Double, Double) = {
      val xs = b._1.sorted; val ys = b._2.sorted
      val n0 = xs.size; val n1 = ys.size
      if (n0 == 0 || n1 == 0) return (Double.NaN, Double.NaN)
      var i = 0; var j = 0; var d = 0.0
      while (i < n0 && j < n1) {
        val x = xs(i); val y = ys(j)
        val v = math.min(x, y)
        while (i < n0 && xs(i) == v) i += 1
        while (j < n1 && ys(j) == v) j += 1
        d = math.max(d, math.abs(i.toDouble / n0 - j.toDouble / n1))
      }
      d = math.max(d, math.abs(1.0 - j.toDouble / n1))
      d = math.max(d, math.abs(i.toDouble / n0 - 1.0))
      val ne = n0.toDouble * n1 / (n0.toDouble + n1)
      val lambda = (math.sqrt(ne) + 0.12 + 0.11 / math.sqrt(ne)) * d
      (d, probks(lambda))
    }
    def bufferEncoder: Encoder[(Vector[Double], Vector[Double])] =
      enc[(Vector[Double], Vector[Double])]
    def outputEncoder: Encoder[(Double, Double)] = enc[(Double, Double)]
  }

  /** ClickHouse categorical-association family over two columns:
    * `cramersV` / `cramersVBiasCorrected` / `theilsU` / `contingency`
    * [public docs: sql-reference/aggregate-functions/reference/cramersv,
    * cramersvbiascorrected, theilsu, contingency]. State is the exact
    * contingency map cell→count — bounded by the DISTINCT PAIR count of
    * the two (categorical) domains, never by row count; merge is
    * map-sum, so the two-phase law holds at any executor count. The
    * finals are the published formulas over χ² / entropies; the
    * relational `agg_cramers_v` / `agg_contingency_theilsu` gate
    * entries prove the same algebra against DuckDB, and
    * `sql_ch_assoc_spellings` hash-matches these UDAFs to that oracle.
    *
    * Key packing: map keys must be atomic for the buffer encoder, so a
    * cell key is `<len(a)>:<a><b>` — the length prefix makes the split
    * unambiguous for ANY category content (no reserved separator).
    */
  class AssocContingency(mode: String)
      extends Aggregator[(String, String),
        (Map[String, Long], Map[String, Long], Map[String, Long]),
        Double] with Serializable {
    require(Seq("cramersV", "cramersVBiasCorrected", "theilsU",
      "contingency").contains(mode), s"unknown association mode '$mode'")
    type Buf = (Map[String, Long], Map[String, Long], Map[String, Long])
    def zero: Buf = (Map.empty, Map.empty, Map.empty)
    private def bump(m: Map[String, Long], k: String): Map[String, Long] =
      m.updated(k, m.getOrElse(k, 0L) + 1L)
    def reduce(b: Buf, in: (String, String)): Buf =
      if (in._1 == null || in._2 == null) b
      else (bump(b._1, s"${in._1.length}:${in._1}${in._2}"),
        bump(b._2, in._1), bump(b._3, in._2))
    /** Inverse of the cell-key packing: (a, b). */
    private def unpack(k: String): (String, String) = {
      val i = k.indexOf(':')
      val len = k.substring(0, i).toInt
      (k.substring(i + 1, i + 1 + len), k.substring(i + 1 + len))
    }
    private def msum(a: Map[String, Long], b: Map[String, Long]) =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def merge(a: Buf, b: Buf): Buf =
      (msum(a._1, b._1), msum(a._2, b._2), msum(a._3, b._3))
    def finish(b: Buf): Double = {
      // key-sorted traversals: Map iteration order is construction-
      // dependent and the double sums below must be canonical
      val (cells0, rws, cls) = b
      val cells = cells0.toVector.sortBy(_._1)
      val n = rws.valuesIterator.sum.toDouble
      if (n == 0) return Double.NaN
      val r = rws.size.toDouble
      val c = cls.size.toDouble
      mode match {
        case "theilsU" =>
          // U = (H(X) − H(X|Y)) / H(X), X = first column — the same
          // direction agg_contingency_theilsu pins against DuckDB
          val hX = rws.toVector.sortBy(_._1).map { case (_, ni) =>
            -(ni / n) * math.log(ni / n)
          }.sum
          if (hX == 0.0) return Double.NaN
          val hXgY = cells.map { case (k, nij) =>
            val nj = cls(unpack(k)._2).toDouble
            -(nij / n) * math.log(nij.toDouble / nj)
          }.sum
          (hX - hXgY) / hX
        case _ =>
          val chi2 = cells.map { case (k, nij) =>
            val (ka, kb) = unpack(k)
            val e = rws(ka).toDouble * cls(kb) / n
            (nij - e) * (nij - e) / e
          }.sum
          mode match {
            case "cramersV" =>
              if (math.min(r, c) < 2) Double.NaN
              else math.sqrt(chi2 / (n * (math.min(r, c) - 1)))
            case "cramersVBiasCorrected" =>
              // Bergsma's correction [public: the formula on the CH
              // doc page]: φ̃² = max(0, φ² − (r−1)(c−1)/(n−1)),
              // r̃ = r − (r−1)²/(n−1), c̃ = c − (c−1)²/(n−1)
              val phi2 = chi2 / n
              val phi2c =
                math.max(0.0, phi2 - (r - 1) * (c - 1) / (n - 1))
              val rC = r - (r - 1) * (r - 1) / (n - 1)
              val cC = c - (c - 1) * (c - 1) / (n - 1)
              if (math.min(rC, cC) <= 1.0) Double.NaN
              else math.sqrt(phi2c / (math.min(rC, cC) - 1.0))
            case _ => math.sqrt(chi2 / (chi2 + n)) // contingency
          }
      }
    }
    def bufferEncoder: Encoder[Buf] = enc[Buf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Classic sequential Largest-Triangle-Three-Buckets downsampling
    * [Steinarsson 2013, public thesis; CH docs: aggregate-functions/
    * reference/largestTriangleThreeBuckets]. State collects (x, y)
    * pairs; finish() sorts by x (then y — full determinism under
    * duplicate x) and walks the buckets picking the point that
    * maximizes the triangle area against the PREVIOUSLY SELECTED
    * point and the next bucket's mean. O(rows) state — intended for
    * per-group series; the relational mean-anchor variant (agg_lttb)
    * is the unbounded-series path.
    */
  class Lttb(buckets: Int)
      extends Aggregator[(Double, Double), Vector[(Double, Double)],
        Seq[(Double, Double)]] with Serializable {
    require(buckets >= 2, s"lttb needs at least 2 buckets, got $buckets")
    private def lttbCap(n: Int): Unit = capCheck(n, "lttb",
      "pre-aggregate the series into time buckets first (the agg_lttb relational form)")
    def zero: Vector[(Double, Double)] = Vector.empty
    def reduce(b: Vector[(Double, Double)], in: (Double, Double)) = {
      lttbCap(b.size); b :+ in
    }
    def merge(a: Vector[(Double, Double)], b: Vector[(Double, Double)]) = {
      lttbCap(a.size + b.size - 1); a ++ b
    }
    def finish(b0: Vector[(Double, Double)]): Seq[(Double, Double)] = {
      val pts = b0.sorted
      val n = pts.size
      if (n <= buckets) return pts
      // first and last points are always kept; the n−2 interior
      // points split into buckets−2 equal ranges
      val out = Vector.newBuilder[(Double, Double)]
      out += pts.head
      var prev = pts.head
      val inner = buckets - 2
      var bi = 0
      while (bi < inner) {
        val lo = 1 + bi * (n - 2) / inner
        val hi = 1 + (bi + 1) * (n - 2) / inner // exclusive
        // anchor: mean of the NEXT bucket (or the last point)
        val (nLo, nHi) =
          if (bi + 1 < inner)
            (1 + (bi + 1) * (n - 2) / inner, 1 + (bi + 2) * (n - 2) / inner)
          else (n - 1, n)
        var ax = 0.0; var ay = 0.0
        var i = nLo
        while (i < nHi) { ax += pts(i)._1; ay += pts(i)._2; i += 1 }
        ax /= (nHi - nLo); ay /= (nHi - nLo)
        var best = lo; var bestArea = -1.0
        i = lo
        while (i < hi) {
          val area = math.abs(
            (prev._1 - ax) * (pts(i)._2 - prev._2) -
              (prev._1 - pts(i)._1) * (ay - prev._2))
          if (area > bestArea) { bestArea = area; best = i }
          i += 1
        }
        out += pts(best)
        prev = pts(best)
        bi += 1
      }
      out += pts.last
      out.result()
    }
    def bufferEncoder: Encoder[Vector[(Double, Double)]] =
      enc[Vector[(Double, Double)]]
    def outputEncoder: Encoder[Seq[(Double, Double)]] =
      enc[Seq[(Double, Double)]]
  }

  /** Spearman rank correlation [CH docs: aggregate-functions/
    * reference/rankCorr]: fractional (tie-averaged) ranks on both
    * samples, then the Pearson correlation of the rank vectors.
    * Collected-pair state; finish() is O(n log n).
    */
  class RankCorr
      extends Aggregator[(Double, Double), Vector[(Double, Double)], Double]
      with Serializable {
    private def rcCap(n: Int): Unit = capCheck(n, "rankCorr",
      "sample the group or use corr over window-ranked columns")
    def zero: Vector[(Double, Double)] = Vector.empty
    def reduce(b: Vector[(Double, Double)], in: (Double, Double)) = {
      rcCap(b.size); b :+ in
    }
    def merge(a: Vector[(Double, Double)], b: Vector[(Double, Double)]) = {
      rcCap(a.size + b.size - 1); a ++ b
    }
    private def fracRanks(v: Vector[Double]): Array[Double] = {
      val n = v.size
      val idx = v.indices.sortBy(v(_))
      val r = new Array[Double](n)
      var i = 0
      while (i < n) {
        var j = i
        while (j + 1 < n && v(idx(j + 1)) == v(idx(i))) j += 1
        val avg = (i + 1 + j + 1) / 2.0
        var k = i
        while (k <= j) { r(idx(k)) = avg; k += 1 }
        i = j + 1
      }
      r
    }
    def finish(b0: Vector[(Double, Double)]): Double = {
      // sort first: collect order varies with partitioning, and the
      // FP accumulation below must not (gate hashes round(…, 6))
      val b = b0.sorted
      val n = b.size
      if (n < 2) return Double.NaN
      val rx = fracRanks(b.map(_._1))
      val ry = fracRanks(b.map(_._2))
      val mx = rx.sum / n; val my = ry.sum / n
      var sxy = 0.0; var sxx = 0.0; var syy = 0.0
      var i = 0
      while (i < n) {
        val dx = rx(i) - mx; val dy = ry(i) - my
        sxy += dx * dy; sxx += dx * dx; syy += dy * dy
        i += 1
      }
      if (sxx == 0.0 || syy == 0.0) Double.NaN
      else sxy / math.sqrt(sxx * syy)
    }
    def bufferEncoder: Encoder[Vector[(Double, Double)]] =
      enc[Vector[(Double, Double)]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** One-way ANOVA [CH docs: aggregate-functions/reference/
    * analysis_of_variance]: F = (SSB/(k−1)) / (SSW/(n−k)) over the
    * per-group moment sums, p from the F(d1, d2) survival function
    * via the regularized incomplete beta (same Numerical Recipes
    * continued fraction the t-test spellings use). State is the
    * per-group (count, Σx, Σx²) map with BigDecimal sums — exact, so
    * FP-order independent at any executor count.
    */
  class AnovaF
      extends Aggregator[(Double, Long),
        Map[Long, (Long, BigDecimal, BigDecimal)], (Double, Double)]
      with Serializable {
    type Buf = Map[Long, (Long, BigDecimal, BigDecimal)]
    def zero: Buf = Map.empty
    def reduce(b: Buf, in: (Double, Long)): Buf = {
      val x = BigDecimal(in._1)
      val (c, s, ss) = b.getOrElse(in._2, (0L, BigDecimal(0), BigDecimal(0)))
      b.updated(in._2, (c + 1, s + x, ss + x * x))
    }
    def merge(a: Buf, b: Buf): Buf =
      b.foldLeft(a) { case (m, (k, (c, s, ss))) =>
        val (c0, s0, ss0) = m.getOrElse(k, (0L, BigDecimal(0), BigDecimal(0)))
        m.updated(k, (c0 + c, s0 + s, ss0 + ss))
      }
    // Lentz continued fraction + Lanczos lgamma (Numerical Recipes
    // §6.4, public algorithm) — self-contained like MannWhitneyU's erf
    private def lgamma(x: Double): Double =
      if (x < 0.5)
        math.log(math.Pi / math.abs(math.sin(math.Pi * x))) - lgamma(1.0 - x)
      else {
        val g = Array(0.99999999999980993, 676.5203681218851,
          -1259.1392167224028, 771.32342877765313, -176.61502916214059,
          12.507343278686905, -0.13857109526572012, 9.9843695780195716e-6,
          1.5056327351493116e-7)
        val z = x - 1.0
        var a = g(0)
        var i = 1
        while (i < 9) { a += g(i) / (z + i); i += 1 }
        val t = z + 7.5
        0.5 * math.log(2 * math.Pi) + (z + 0.5) * math.log(t) - t + math.log(a)
      }
    private def betacf(a: Double, b: Double, x: Double): Double = {
      val fpmin = 1e-300
      val qab = a + b; val qap = a + 1.0; val qam = a - 1.0
      var c = 1.0
      var d = 1.0 - qab * x / qap
      if (math.abs(d) < fpmin) d = fpmin
      d = 1.0 / d
      var h = d
      var m = 1
      while (m <= 200) {
        val m2 = 2 * m
        var aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d; h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d; if (math.abs(d) < fpmin) d = fpmin
        c = 1.0 + aa / c; if (math.abs(c) < fpmin) c = fpmin
        d = 1.0 / d
        val del = d * c
        h *= del
        if (math.abs(del - 1.0) < 1e-14) return h
        m += 1
      }
      h
    }
    private def ibeta(a: Double, b: Double, x: Double): Double = {
      if (x <= 0.0) return 0.0
      if (x >= 1.0) return 1.0
      val bt = math.exp(lgamma(a + b) - lgamma(a) - lgamma(b) +
        a * math.log(x) + b * math.log(1.0 - x))
      if (x < (a + 1.0) / (a + b + 2.0)) bt * betacf(a, b, x) / a
      else 1.0 - bt * betacf(b, a, 1.0 - x) / b
    }
    def finish(b: Buf): (Double, Double) = {
      val k = b.size
      val n = b.valuesIterator.map(_._1).sum
      if (k < 2 || n <= k) return (Double.NaN, Double.NaN)
      // key-sorted traversal: Map iteration order is construction-
      // dependent and the ssb double-sum below must be canonical
      val groups = b.toVector.sortBy(_._1).map(_._2)
      val totS = groups.map(_._2).foldLeft(BigDecimal(0))(_ + _)
      val totSS = groups.map(_._3).foldLeft(BigDecimal(0))(_ + _)
      val grand = totS.toDouble / n
      var ssb = 0.0
      groups.foreach { case (c, s, _) =>
        val d = s.toDouble / c - grand
        ssb += c * d * d
      }
      val sst = totSS.toDouble - n * grand * grand
      val ssw = sst - ssb
      val d1 = (k - 1).toDouble
      val d2 = (n - k).toDouble
      val f = (ssb / d1) / (ssw / d2)
      val p = ibeta(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))
      (f, p)
    }
    def bufferEncoder: Encoder[Buf] = enc[Buf]
    def outputEncoder: Encoder[(Double, Double)] = enc[(Double, Double)]
  }

  /** Fitted model carried as a first-class value: `method` steers
    * evalMLMethod's link function, `weights` is (w_1…w_d, intercept).
    * This struct plays the role of CH's opaque -State blob for the
    * stochastic*Regression family — except it is inspectable SQL data.
    */
  case class MLModel(method: String, weights: Seq[Double])

  /** `stochasticLinearRegression(lr, l2, batch, method)(y, [x…])`
    * [CH docs: aggregate-functions/reference/stochasticlinearregression].
    * CH fits with seeded SGD whose result depends on batch order —
    * nondeterministic on any parallel engine. The deterministic
    * Spark-first replacement solves the SAME objective exactly:
    * closed-form ridge via the normal equations, accumulating the
    * augmented-design Gram matrix X'X (upper triangle) and X'y in
    * exact BigDecimal sums — a two-phase map-sum aggregate, executor-
    * count independent, O(d²) state for d features. The learning-rate
    * and batch-size parameters steer only CH's optimizer and are
    * ignored; l2 is honored (intercept unpenalized, the standard
    * ridge convention).
    */
  class LinRegFit(dims: Int, l2: Double)
      extends Aggregator[(Double, Seq[Double]),
        (Vector[BigDecimal], Vector[BigDecimal], Long), MLModel]
      with Serializable {
    require(dims >= 1 && dims <= 32,
      s"stochasticLinearRegression supports 1..32 features, got $dims")
    private val d = dims + 1 // + intercept column
    private val triN = d * (d + 1) / 2
    type Buf = (Vector[BigDecimal], Vector[BigDecimal], Long)
    def zero: Buf =
      (Vector.fill(triN)(BigDecimal(0)), Vector.fill(d)(BigDecimal(0)), 0L)
    @inline private def tri(i: Int, j: Int): Int = // i <= j
      i * d - i * (i - 1) / 2 + (j - i)
    def reduce(b: Buf, in: (Double, Seq[Double])): Buf = {
      val (y, xs) = in
      if (xs == null || xs.size != dims || y.isNaN) return b
      val x = new Array[Double](d)
      var i = 0
      while (i < dims) { x(i) = xs(i); i += 1 }
      x(dims) = 1.0
      var xtx = b._1; var xty = b._2
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          xtx = xtx.updated(tri(i, j), xtx(tri(i, j)) + BigDecimal(x(i) * x(j)))
          j += 1
        }
        xty = xty.updated(i, xty(i) + BigDecimal(x(i) * y))
        i += 1
      }
      (xtx, xty, b._3 + 1)
    }
    def merge(a: Buf, b: Buf): Buf = (
      a._1.zip(b._1).map { case (p, q) => p + q },
      a._2.zip(b._2).map { case (p, q) => p + q },
      a._3 + b._3)
    def finish(b: Buf): MLModel = {
      val n = b._3
      if (n == 0) return MLModel("linear", Vector.fill(d)(Double.NaN))
      // dense (A | b), A = X'X + l2·I (intercept unpenalized)
      val a = Array.ofDim[Double](d, d + 1)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          a(i)(j) = b._1(if (i <= j) tri(i, j) else tri(j, i)).toDouble
          j += 1
        }
        if (i < dims) a(i)(i) += l2 * n
        a(i)(d) = b._2(i).toDouble
        i += 1
      }
      // Gaussian elimination with partial pivoting
      i = 0
      while (i < d) {
        var p = i
        var r = i + 1
        while (r < d) { if (math.abs(a(r)(i)) > math.abs(a(p)(i))) p = r; r += 1 }
        val t = a(i); a(i) = a(p); a(p) = t
        if (math.abs(a(i)(i)) < 1e-300)
          return MLModel("linear", Vector.fill(d)(Double.NaN))
        r = i + 1
        while (r < d) {
          val f = a(r)(i) / a(i)(i)
          var c = i
          while (c <= d) { a(r)(c) -= f * a(i)(c); c += 1 }
          r += 1
        }
        i += 1
      }
      val w = new Array[Double](d)
      i = d - 1
      while (i >= 0) {
        var s = a(i)(d)
        var c = i + 1
        while (c < d) { s -= a(i)(c) * w(c); c += 1 }
        w(i) = s / a(i)(i)
        i -= 1
      }
      MLModel("linear", w.toVector)
    }
    def bufferEncoder: Encoder[Buf] = enc[Buf]
    def outputEncoder: Encoder[MLModel] = enc[MLModel]
  }

  /** `stochasticLogisticRegression(...)(label, [x…])` — deterministic
    * replacement for CH's seeded SGD: collected rows, canonical sort,
    * then fixed-count full-batch gradient descent on the l2-penalized
    * logistic loss (500 rounds, unit step on the mean gradient; the
    * intercept unpenalized). CH documents its own result as batch-
    * order dependent, so only the decision FUNCTION is contractual —
    * specs pin side-correctness and determinism, not bit patterns.
    * State is O(rows·d); per-group input is capped loudly.
    */
  class LogRegFit(dims: Int, l2: Double)
      extends Aggregator[(Double, Seq[Double]),
        Vector[(Double, Vector[Double])], MLModel] with Serializable {
    require(dims >= 1 && dims <= 32,
      s"stochasticLogisticRegression supports 1..32 features, got $dims")
    private val cap = 1 << 22
    def zero: Vector[(Double, Vector[Double])] = Vector.empty
    def reduce(b: Vector[(Double, Vector[Double])], in: (Double, Seq[Double])) = {
      require(b.size < cap,
        s"stochasticLogisticRegression: group exceeds $cap rows — " +
          "sample the group or fit per-partition models")
      if (in._2 == null || in._2.size != dims) b
      else b :+ (in._1, in._2.toVector)
    }
    def merge(a: Vector[(Double, Vector[Double])],
        b: Vector[(Double, Vector[Double])]) = a ++ b
    def finish(rows0: Vector[(Double, Vector[Double])]): MLModel = {
      val d = dims + 1
      if (rows0.isEmpty) return MLModel("logistic", Vector.fill(d)(Double.NaN))
      // canonical order → deterministic FP path (any total order does)
      val rows = rows0.sortBy(r => (r._1, r._2.mkString("|")))
      val n = rows.size
      val w = new Array[Double](d)
      var it = 0
      while (it < 500) {
        val g = new Array[Double](d)
        rows.foreach { case (y, xs) =>
          var z = w(dims)
          var i = 0
          while (i < dims) { z += w(i) * xs(i); i += 1 }
          val p = 1.0 / (1.0 + math.exp(-z))
          val e = p - y
          i = 0
          while (i < dims) { g(i) += e * xs(i); i += 1 }
          g(dims) += e
        }
        var i = 0
        while (i < d) {
          val reg = if (i < dims) l2 * w(i) else 0.0
          w(i) -= (g(i) / n + reg)
          i += 1
        }
        it += 1
      }
      MLModel("logistic", w.toVector)
    }
    def bufferEncoder: Encoder[Vector[(Double, Vector[Double])]] =
      enc[Vector[(Double, Vector[Double])]]
    def outputEncoder: Encoder[MLModel] = enc[MLModel]
  }

  /** Total length of the UNION of [start, end) intervals [CH docs:
    * aggregate-functions/reference/intervalLengthSum] — collected
    * intervals, sort-by-start sweep in finish(). Zero- and
    * negative-length intervals contribute nothing (CH ignores
    * start ≥ end pairs).
    */
  class IntervalLengthSum
      extends Aggregator[(Double, Double), Vector[(Double, Double)], Double]
      with Serializable {
    private def ilsCap(n: Int): Unit = capCheck(n, "intervalLengthSum",
      "pre-merge intervals per sub-key before aggregating")
    def zero: Vector[(Double, Double)] = Vector.empty
    def reduce(b: Vector[(Double, Double)], in: (Double, Double)) = {
      ilsCap(b.size)
      if (in._1 < in._2) b :+ in else b
    }
    def merge(a: Vector[(Double, Double)], b: Vector[(Double, Double)]) = {
      ilsCap(a.size + b.size - 1); a ++ b
    }
    def finish(b: Vector[(Double, Double)]): Double = {
      if (b.isEmpty) return 0.0
      val s = b.sorted
      var total = 0.0
      var lo = s.head._1; var hi = s.head._2
      var i = 1
      while (i < s.size) {
        val (a2, b2) = s(i)
        if (a2 > hi) { total += hi - lo; lo = a2; hi = b2 }
        else if (b2 > hi) hi = b2
        i += 1
      }
      total + (hi - lo)
    }
    def bufferEncoder: Encoder[Vector[(Double, Double)]] =
      enc[Vector[(Double, Double)]]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
