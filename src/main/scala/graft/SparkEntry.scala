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
  def oracleSql: Map[String, String] =
    registries.flatMap(q =>
      q.dynOracle.flatMap(f => f()).orElse(q.oracle)
        .map(o => q.name -> o.trim)).toMap
}
