package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.aggregate.ScalaAggregator

/** Dedup semantically-identical UDAF calls within one Aggregate.
  *
  * Spark's PhysicalAggregation dedups aggregate calls by canonicalized
  * equality, which works for builtin declarative aggregates but FAILS
  * for [[ScalaAggregator]] (registered Aggregator UDAFs): each parsed
  * call re-resolves its encoders into fresh expression trees, so two
  * textually identical calls — `avgForEach(xs)[1] … avgForEach(xs)[2]`
  * is the natural CH spelling — are never structurally equal and the
  * typed buffer is built and merged once PER CALL. UDAF reduce paths
  * are the most expensive per-row code in the engine (boxed buffers,
  * no codegen), so N duplicate calls cost N full passes.
  *
  * This rule keys ScalaAggregator calls on what identifies them
  * semantically — the registered Aggregator INSTANCE, canonicalized
  * children, DISTINCT flag and FILTER — computes each distinct call
  * once, and rebuilds the original output via a Project over the
  * slimmed Aggregate (original names and exprIds preserved, so the
  * surrounding plan is untouched). Fires only when an Aggregate
  * actually contains duplicate UDAF calls.
  */
object DedupAggregateCalls extends Rule[LogicalPlan] {

  private def keyOf(ae: AggregateExpression): Any = ae.aggregateFunction match {
    case sa: ScalaAggregator[_, _, _] =>
      (sa.agg, sa.children.map(_.canonicalized), ae.isDistinct,
        ae.filter.map(_.canonicalized))
    case _ => ae.canonicalized
  }

  private def hasDupUdafs(agg: Aggregate): Boolean = {
    val udafKeys = agg.aggregateExpressions.flatMap(_.collect {
      case ae: AggregateExpression
          if ae.aggregateFunction.isInstanceOf[ScalaAggregator[_, _, _]] =>
        keyOf(ae)
    })
    udafKeys.size != udafKeys.distinct.size
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate if agg.resolved && hasDupUdafs(agg) => rewrite(agg)
  }

  private def rewrite(agg: Aggregate): LogicalPlan = {
    // one alias per distinct aggregate call, in first-appearance order
    val calls = scala.collection.mutable.LinkedHashMap[Any, Alias]()
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression =>
        val k = keyOf(ae)
        if (!calls.contains(k)) calls(k) = Alias(ae, s"_dedup_agg${calls.size}")()
      case _ =>
    })
    // pass every grouping expression through the Aggregate so the
    // restoring Project can reference it
    val grp: Seq[(Expression, NamedExpression)] = agg.groupingExpressions.map {
      case a: Attribute => (a.canonicalized, a)
      case e => (e.canonicalized, Alias(e, "_dedup_grp")())
    }
    val grpMap = grp.toMap
    val newAgg = agg.copy(
      aggregateExpressions = grp.map(_._2) ++ calls.values.toSeq)
    val restored = agg.aggregateExpressions.map { ne =>
      ne.transformDown {
        case ae: AggregateExpression => calls(keyOf(ae)).toAttribute
        case e if grpMap.contains(e.canonicalized) =>
          grpMap(e.canonicalized).toAttribute
      }.asInstanceOf[NamedExpression]
    }
    Project(restored, newAgg)
  }

  /** Post-hoc install on an existing session (mirrors
    * Projections.install); builder-configured sessions get it via
    * GraftExtensions instead. Idempotent.
    */
  def install(spark: SparkSession): Unit = synchronized {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(DedupAggregateCalls))
      spark.experimental.extraOptimizations = cur :+ DedupAggregateCalls
  }
}
