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
    Tables.names.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
  }

  /** SQL entry point (sugar; views must be registered via init). */
  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
