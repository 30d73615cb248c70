package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational helpers for ClickHouse surfaces Spark lacks as single
  * operators (SURVEY.md §2.1 MergeTree-family query-time semantics,
  * §2.4 LIMIT BY, §2.6 DISTINCT ON / WITH FILL).
  *
  * All of these are one window pass or one generate+join — each is a
  * single shuffle on its key set, so they scale like any groupBy.
  */
object Relational {

  /** ReplacingMergeTree analog: keep the latest row per key by
    * `version` (upstream ReplacingSortedAlgorithm semantics at
    * query time — FINAL dedup). Deterministic when (keys, version)
    * is unique; add tie-break columns to `version` otherwise.
    */
  def replacingLatest(df: DataFrame, keys: Seq[String], version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** CollapsingMergeTree analog: net out +1/−1 `sign` rows per key;
    * groups whose signs cancel disappear (upstream
    * CollapsingSortedAlgorithm semantics).
    */
  def collapse(df: DataFrame, keys: Seq[String], sign: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(sign).as("net_sign"), count(lit(1)).as("n_rows"))
      .filter(col("net_sign") =!= 0)

  /** ClickHouse `LIMIT n BY keys`: first n rows per key group in the
    * given order.
    */
  def limitBy(df: DataFrame, keys: Seq[String], n: Int, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= n).drop("__rn")
  }

  /** `DISTINCT ON (keys)` with explicit ordering (deterministic,
    * unlike a bare dropDuplicates): the first row per key group.
    */
  def distinctOn(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    limitBy(df, keys, 1, order)

  /** `ORDER BY date WITH FILL STEP 1 day` over an aggregated frame:
    * generates the full calendar between the frame's min and max date
    * (one 1-row cross join, then explode) and left-joins the data in,
    * filling absent rows with `fillValue`. The generate side is tiny
    * (one row per step), so the join broadcasts.
    */
  def withFillDays(df: DataFrame, dateCol: String, fill: Map[String, Column]): DataFrame = {
    val mm = df.agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
    val cal = mm.select(explode(sequence(col("__lo"), col("__hi"),
      expr("INTERVAL 1 DAY"))).as(dateCol))
    val joined = broadcast(cal).join(df, Seq(dateCol), "left")
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
  }
}
