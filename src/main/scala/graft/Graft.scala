package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Library front door: make a SparkSession speak the engine's
  * dialect the way a ClickHouse user expects — named tables + SQL.
  *
  * After `Graft.init(spark, sfDir)` every fixture table is a temp
  * view and the custom functions (cosine_sim, shingle_rows) are
  * registered, so `spark.sql("SELECT ... FROM lineitem ...")` runs
  * directly — Catalyst plans it identically to the DataFrame forms
  * used in the declared queries.
  */
object Graft {

  /** Register all fixture tables as temp views + custom functions +
    * the ClickHouse-spelled function dialect (sipHash64, toStartOfDay,
    * lengthUTF8, multiIf, … — see [[graft.functions.ChDialect]]).
    */
  def init(spark: SparkSession, dir: String): Unit = {
    GraftFunctions.register(spark)
    graft.functions.ChDialect.register(spark)
    // unparameterized custom Aggregators under their CH spellings
    // (parameterized ones — windowFunnel(w), topK(k) — use CH's
    // fn(params)(args) syntax, which Spark SQL cannot parse; those
    // stay DataFrame-level via ops/Aggregates)
    spark.udf.register("groupBitmap",
      org.apache.spark.sql.functions.udaf(new graft.ops.Aggregates.GroupBitmap))
    graft.plans.LimitByPlan.install(spark)
    Tables.names.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** ClickHouse's `dateDiff('day', a, b)` cannot be a registry
    * function: Spark's PARSER special-cases 3-arg datediff as
    * timestampdiff and rejects quoted units before resolution ever
    * runs. The front door rewrites the CH spelling (quoted unit ⇒
    * unambiguously CH — Spark's own 2-arg datediff has no string
    * literal first argument) to the registry-resolvable chDateDiff.
    */
  private val chDateDiff =
    """(?i)\bdate_?diff\s*\(\s*('[a-z]+')""".r

  /** SQL entry point (sugar; views must be registered via init).
    * Applies the few CH spellings that need PARSER-level rewriting —
    * everything else resolves through the function registry
    * ([[graft.functions.ChDialect]]).
    */
  def sql(spark: SparkSession, query: String): DataFrame =
    spark.sql(chDateDiff.replaceAllIn(query, m => s"chDateDiff(${m.group(1)}"))
}
