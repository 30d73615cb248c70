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

  // function registrations are per-SESSION idempotent state that no
  // statement (DML, CREATE/DROP FUNCTION on user names) un-registers —
  // do them once; re-registering ~170 names + parsing ~30 macro bodies
  // on every init was a measurable fixed cost per SQL-front-door query
  private val registeredSessions =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  /** Register all fixture tables as temp views + custom functions +
    * the ClickHouse-spelled function dialect (sipHash64, toStartOfDay,
    * lengthUTF8, multiIf, … — see [[graft.functions.ChDialect]]).
    *
    * Views are RE-POINTED on every call (cheap: schema reads cache in
    * the session's FileIndex) so a prior ALTER/INSERT/TRUNCATE
    * snapshot never leaks into the next caller's fixture state;
    * parameterized aggregates — windowFunnel(w)(…), topK(k)(…) — need
    * no registration here: ChSql's parametric rewrite registers their
    * UDAFs on demand per (function, parameters).
    */
  def init(spark: SparkSession, dir: String): Unit = {
    // Pin the session timezone: the fixture's tz-naive timestamps are
    // cast to TIMESTAMP under the session zone (Tables.scala), so a
    // consumer-built non-UTC session would silently shift every
    // events.ts value. CH's analog is the server timezone; this
    // library's contract is UTC (same as all five bundled mains).
    if (spark.conf.get("spark.sql.session.timeZone") != "UTC")
      spark.conf.set("spark.sql.session.timeZone", "UTC")
    // Mark the session registered only once ALL registrations succeed:
    // a throw mid-registration (e.g. a duplicate-name guard trip) must
    // leave the session eligible for a clean retry, never half-registered
    // with later names missing (UNRESOLVED_ROUTINE on toString/dictGet/…).
    if (registeredSessions.add(spark)) {
      try {
        GraftFunctions.register(spark)
        graft.functions.ChDialect.register(spark)
        // unparameterized custom Aggregators under their CH spellings
        spark.udf.register("groupBitmap",
          org.apache.spark.sql.functions.udaf(new graft.ops.Aggregates.GroupBitmap))
        // uniqTheta at the default capacity: the sketch column (k-min
        // hash array) — combine with size/array_union/… for estimates
        spark.udf.register("uniqTheta",
          org.apache.spark.sql.functions.udaf(new graft.ops.Aggregates.ThetaSketch(4096)))
        graft.plans.LimitByPlan.install(spark)
        graft.plans.DedupAggregateCalls.install(spark)
      } catch {
        case t: Throwable =>
          registeredSessions.remove(spark)
          throw t
      }
    }
    Tables.names.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    ChSql.setDataDir(spark, dir)
  }

  /** SQL entry point (sugar; views must be registered via init).
    * [[ChSql]] handles the spellings and clauses that need
    * PARSER-level routing — `dateDiff('unit', …)`, `SAMPLE f`,
    * `GROUP BY … WITH TOTALS`, `ORDER BY … WITH FILL`, `LIMIT n BY` —
    * everything else resolves through the function registry
    * ([[graft.functions.ChDialect]]).
    */
  def sql(spark: SparkSession, query: String): DataFrame =
    ChSql.run(spark, query)
}
