package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

import scala.collection.mutable

/** ClickHouse `LIMIT n BY keys` as a FIRST-CLASS physical operator
  * (SURVEY §2.10(c): custom LogicalPlan + Strategy + SparkPlan), and
  * the reason to bother: the window-function form
  * (`row_number().over(partitionBy(keys).orderBy(order)) <= n`)
  * shuffles EVERY input row before any pruning. This operator prunes
  * map-side first — each input partition keeps at most n rows per key
  * it sees (a bounded per-key heap), so the exchange moves
  * O(keys · n) rows per partition instead of O(rows). At 100 TB with
  * small n that is the difference between shuffling terabytes and
  * shuffling megabytes; the same partial/final split Spark's own
  * hash aggregation uses, applied to grouped top-n.
  *
  * Plan shape (EnsureRequirements inserts the exchange + sort):
  *
  *   FinalLimitByExec  (requires clustering by keys, keys++order sort)
  *     +- Exchange hashpartitioning(keys)
  *        +- PartialLimitByExec  (per-partition bounded heaps)
  *           +- child
  */
case class LimitByNode(keys: Seq[Attribute], order: Seq[SortOrder], n: Int,
    child: LogicalPlan,
    maxKeys: Int = LimitByPlan.defaultMaxKeys) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LimitByNode =
    copy(child = newChild)
}

object LimitByStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case LimitByNode(keys, order, n, child, maxKeys) =>
      val planned = planLater(child)
      FinalLimitByExec(keys, order, n,
        PartialLimitByExec(keys, order, n, planned, maxKeys)) :: Nil
    case _ => Nil
  }
}

/** Map-side pruning: per input partition, keep the first n rows per
  * key in `order` (a bounded max-heap per key — evict the worst kept
  * row when a better one arrives). Memory is O(min(keys-per-partition,
  * maxKeys) · n) rows: once a partition has seen `maxKeys` distinct
  * keys, rows of NEW keys pass through un-pruned (already-tracked keys
  * keep pruning). Pruning here is best-effort by construction — the
  * final stage re-applies the limit after the exchange — so the cap
  * trades shuffle volume for a HARD memory bound on high-cardinality
  * keys, the same fallback contract as partial hash aggregation's
  * spill path. Emits pruned rows in no particular order — the final
  * stage re-sorts after the exchange.
  */
case class PartialLimitByExec(keys: Seq[Attribute], order: Seq[SortOrder],
    n: Int, child: SparkPlan,
    maxKeys: Int = LimitByPlan.defaultMaxKeys) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: SparkPlan): PartialLimitByExec =
    copy(child = newChild)

  // Real SQLMetrics: pruning effectiveness is THE point of this
  // operator — surfacing it in the UI/plan makes shuffle-volume
  // regressions observable, and the spec asserts on it.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "prunedRows" -> SQLMetrics.createMetric(sparkContext,
      "rows pruned before exchange"),
    "passThroughRows" -> SQLMetrics.createMetric(sparkContext,
      "rows passed through over the key cap"))

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = n
    val cap = maxKeys
    val childOutput = child.output
    val outRows = longMetric("numOutputRows")
    val pruned = longMetric("prunedRows")
    val passed = longMetric("passThroughRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord: Ordering[InternalRow] =
        RowOrdering.create(sortOrder, childOutput)
      var seen = 0L
      var passedLocal = 0L
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      val passThrough = iter.filter { row =>
        seen += 1
        val k = keyProj(row)
        heaps.get(k) match {
          case Some(h) =>
            if (h.size < limit) h += row.copy()
            else if (ord.compare(row, h.head) < 0) { h.dequeue(); h += row.copy() }
            false
          case None if heaps.size < cap =>
            val h = mutable.PriorityQueue.empty[InternalRow](ord)
            h += row.copy()
            heaps.put(k.copy(), h)
            false
          case None =>
            passedLocal += 1; passed += 1
            true // over the cap: final stage prunes
        }
      }
      // `++` is lazy in its second operand: the heaps drain only after
      // the pass-through scan has consumed the input (so `seen` and
      // the heaps are complete when each later stage begins) — the
      // drain MUST stay inside the by-name operand, not a hoisted val.
      (passThrough ++ heaps.valuesIterator.flatMap(_.iterator)).map { r =>
        outRows += 1
        r
      } ++ {
        // runs after everything else: rows dropped = seen − kept
        pruned += seen - heaps.valuesIterator.map(_.size).sum - passedLocal
        Iterator.empty
      }
    }
  }
}

/** Final stage: child is clustered by keys and sorted by keys++order,
  * so a single streaming pass emits the first n rows of each key run.
  */
case class FinalLimitByExec(keys: Seq[Attribute], order: Seq[SortOrder],
    n: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    (keys.map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending)) ++ order) :: Nil
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head
  override def outputPartitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): FinalLimitByExec =
    copy(child = newChild)
  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val limit = n
    val childOutput = child.output
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var current: UnsafeRow = null
      var count = 0
      iter.flatMap { row =>
        val k = keyProj(row)
        if (current == null || k != current) { current = k.copy(); count = 0 }
        count += 1
        if (count <= limit) Iterator.single(row) else Iterator.empty
      }
    }
  }
}

object LimitByPlan {

  /** Partial-stage distinct-key cap: 64k keys · n rows per partition
    * is the memory ceiling; beyond it new keys stream through to the
    * exchange un-pruned (correctness unaffected — see
    * [[PartialLimitByExec]]).
    */
  val defaultMaxKeys: Int = 1 << 16

  /** Install the strategy on an existing session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(LimitByStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ LimitByStrategy

  /** `LIMIT n BY keys ORDER BY order` through the custom operator.
    * Column names resolve against df's analyzed output; order entries
    * are (name, ascending).
    */
  def limitBy(df: DataFrame, keys: Seq[String], n: Int,
      order: Seq[(String, Boolean)],
      maxKeys: Int = defaultMaxKeys): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"limitBy: no column '$name' in ${analyzed.output.map(_.name)}"))
    val sortOrder = order.map { case (name, asc) =>
      SortOrder(attr(name),
        if (asc) org.apache.spark.sql.catalyst.expressions.Ascending
        else org.apache.spark.sql.catalyst.expressions.Descending)
    }
    GraftDatasetBridge.ofRows(spark,
      LimitByNode(keys.map(attr), sortOrder, n, analyzed, maxKeys))
  }
}
