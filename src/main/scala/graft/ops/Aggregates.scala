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
}
