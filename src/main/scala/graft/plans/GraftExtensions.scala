package graft.plans

import graft.functions.{CosineSimilarity, ShingleRows}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Production registration path (SURVEY.md §3.4/§4): install with
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions)
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  *
  * and every session — including SQL-only clients — gets the custom
  * functions plus the optimizer rule below. (`GraftFunctions.register`
  * remains as the per-session fallback used by the declared queries,
  * since the driver builds its own plain sessions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[Expression]) => CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_rows"),
      new ExpressionInfo(classOf[ShingleRows].getName, "shingle_rows"),
      (children: Seq[Expression]) => ShingleRows(children(0), children(1))))
    ext.injectOptimizerRule(_ => CanonicalizeCosine)
    ext.injectOptimizerRule(_ => DedupAggregateCalls)
    // the LIMIT n BY physical operator (partial map-side pruning) —
    // builder-configured sessions get the strategy without the
    // per-session LimitByPlan.install fallback
    ext.injectPlannerStrategy(_ => LimitByStrategy)
  }
}

/** cosine_sim is symmetric (dot and the two norms swap roles), so
  * argument order is semantically irrelevant — canonicalizing it
  * makes `cosine_sim(a, b)` and `cosine_sim(b, a)` structurally equal,
  * which unlocks Catalyst subexpression elimination across the two.
  */
object CanonicalizeCosine extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c @ CosineSimilarity(l, r)
          if l.canonicalized.hashCode() > r.canonicalized.hashCode() =>
        CosineSimilarity(r, l)
    }
}
