package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are assembled from the per-§2-section registries; each QDef
  * carries its DuckDB oracle twin where SQL-expressible.
  */
object SparkEntry {

  private def registries: Seq[QDef] =
    CoreQueries.defs ++ JoinQueries.defs ++ WindowQueries.defs ++
      AggQueries.defs ++ ScalarQueries.defs ++ MergeTreeQueries.defs ++
      PipelineQueries.defs ++ FunnelQueries.defs ++ ExtrasQueries.defs ++
      Extras2Queries.defs ++ StatsQueries.defs ++ Stats2Queries.defs ++
      CompositeQueries.defs ++ TpchQueries.defs ++ ChSqlQueries.defs ++
      Pipeline2Queries.defs ++ ClickBenchQueries.defs ++ S2Queries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q1(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    * dynOracle entries (data-derived literal constants) are resolved
    * here, at dump time, after the queries have run. */
  def oracleSql: Map[String, String] = oracleSqlFor(None)

  /** Like [[oracleSql]] but resolving ONLY the named entries — a
    * dynOracle thunk for an unrelated query must not trigger work
    * (e.g. an IVF index build) for a dataset the run never touched.
    * A thunk that throws degrades ITS entry to oracle-free (the
    * documented dynOracle contract) instead of zeroing the whole dump.
    */
  def oracleSqlFor(only: Option[Set[String]]): Map[String, String] =
    registries
      .filter(q => only.forall(_.contains(q.name)))
      .flatMap { q =>
        val dyn = q.dynOracle.flatMap { f =>
          try f()
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(
                s"[oracle] dynOracle for ${q.name} failed, " +
                  s"degrading to oracle-free: ${e.getMessage}")
              None
          }
        }
        dyn.orElse(q.oracle).map(o => q.name -> o.trim)
      }.toMap

  /** Names that DECLARE an oracle (static or dynamic) WITHOUT
    * resolving any dynOracle thunk — for contract enumeration in
    * specs (resolving would run data-dependent builds inside a
    * unit test).
    */
  def oracleDeclaredNames: Set[String] =
    registries.filter(q => q.oracle.isDefined || q.dynOracle.isDefined)
      .map(_.name).toSet
}
