package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ClickHouse `sequenceNextNode(direction, base)(ts, event, …)`
  * [public docs: sql-reference/aggregate-functions/parametric-functions
  * #sequencenextnode]: given each key's time-ordered event list, find
  * the event chain `e1 → e2 → … → eN` matched CONSECUTIVELY (adjacent
  * events, no gaps — CH's documented contract) and return the value of
  * the event immediately after (direction=forward) or before
  * (direction=backward) the matched chain.
  *
  * Spark-first shape: the per-key event list is a
  * `sort_array(collect_list(struct(ts, tie, et)))` column and the
  * chain scan is pure higher-order functions (`filter` over an index
  * `sequence`) — whole-stage-codegen'd, no UDAF, state bounded by
  * events-per-key exactly like CH's implementation.
  */
object Sequences {

  /** Next-node over an ALREADY time-sorted array column of structs
    * whose LAST field (name `et`) is the event label.
    *
    * @param evsSorted array<struct<…, et: string>> sorted ascending by
    *                  its leading time/tie fields
    * @param chain     consecutive event labels to match (non-empty)
    * @param direction `forward` (scan old→new, return event AFTER the
    *                  chain) or `backward` (scan new→old, return the
    *                  event chronologically BEFORE the chain; the
    *                  chain labels are then matched newest-first,
    *                  CH's documented backward orientation)
    * @param base      `head` (chain must start at the very first event
    *                  in scan order), `tail` (alias of head under
    *                  backward — kept for CH spelling parity),
    *                  `first_match` / `last_match` (first/last chain
    *                  occurrence in scan order)
    */
  def nextNode(evsSorted: Column, chain: Seq[String],
      direction: String = "forward", base: String = "first_match"): Column = {
    require(chain.nonEmpty, "sequenceNextNode: empty chain")
    val evs = direction match {
      case "forward" => evsSorted
      case "backward" => reverse(evsSorted)
      case other => throw new IllegalArgumentException(
        s"sequenceNextNode: direction must be forward|backward, got '$other'")
    }
    val len = chain.size
    val n = size(evs)
    // 1-based start index i matches when evs[i..i+len-1].et == chain.
    def matchAt(i: Column): Column =
      chain.zipWithIndex.map { case (c, k) =>
        try_element_at(evs, i + lit(k)).getField("et") === c
      }.reduce(_ && _)
    val start: Column = base match {
      case "head" | "tail" =>
        when(n >= len && matchAt(lit(1)), lit(1))
      case "first_match" =>
        when(n >= len,
          try_element_at(filter(sequence(lit(1), n - len + 1),
            i => matchAt(i)), lit(1)))
      case "last_match" =>
        when(n >= len,
          try_element_at(filter(sequence(lit(1), n - len + 1),
            i => matchAt(i)), lit(-1)))
      case other => throw new IllegalArgumentException(
        s"sequenceNextNode: base must be head|tail|first_match|last_match, got '$other'")
    }
    when(start.isNotNull && start + len <= n,
      try_element_at(evs, start + len).getField("et"))
  }
}
