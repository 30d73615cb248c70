package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed quantiles (ClickHouse `quantileExact*` at scale).
  *
  * Spark's builtin `percentile` buffers EVERY row of a group in the
  * aggregation buffer — at 100 TB a hot group OOMs an executor. This
  * operator computes the identical interpolated quantile from the
  * VALUE-COUNT distribution instead:
  *
  *   1. `groupBy(group, value).count()` — a normal partially-aggregated
  *      shuffle (map-side combine does the heavy reduction);
  *   2. per-group cumulative counts over the sorted DISTINCT values
  *      (a per-group window whose working set is O(distinct values),
  *      not O(rows));
  *   3. the 1-based fractional rank r = 1 + q·(n−1) is answered by the
  *      minimal values whose cumulative count reaches ⌊r⌋ and ⌈r⌉,
  *      linearly interpolated — the same formula `percentile` and
  *      DuckDB `quantile_cont` use.
  *
  * For bounded-cardinality measures (integer quantities, money in
  * cents, bucketed latencies) this is scale-flat. For truly continuous
  * unbounded columns distinct ≈ rows and no exact method avoids the
  * per-group working set — that's what the mergeable t-digest
  * ([[Aggregates.TDigestQuantiles]]) is for.
  */
object Quantiles {

  /** One output row per group and q: `groupCols*, q, quantile`. */
  def exactQuantiles(df: DataFrame, groupCols: Seq[String], value: Column,
      qs: Seq[Double]): DataFrame = {
    val grp = groupCols.map(col)
    // NULLs are excluded before counting — percentile and quantile_cont
    // both ignore NULL inputs; counting them would shift every rank.
    val vc = df.select(grp :+ value.cast("double").as("__v"): _*)
      .filter(col("__v").isNotNull)
      .groupBy(grp :+ col("__v"): _*).agg(count(lit(1)).as("__c"))
    val byVal = Window.partitionBy(grp: _*).orderBy(col("__v"))
    val whole = Window.partitionBy(grp: _*)
    val cum = vc
      .withColumn("__cum", sum(col("__c")).over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__c")).over(whole))
    val qdf = {
      val spark = df.sparkSession
      import spark.implicits._
      qs.toDF("q")
    }
    cum.crossJoin(broadcast(qdf))
      .withColumn("__r", lit(1.0) + col("q") * (col("__n") - 1))
      .groupBy(grp :+ col("q"): _*)
      .agg(
        min(when(col("__cum") >= floor(col("__r")), col("__v"))).as("__xf"),
        min(when(col("__cum") >= ceil(col("__r")), col("__v"))).as("__xc"),
        first(col("__r")).as("__rr"))
      .withColumn("quantile",
        col("__xf") + (col("__rr") - floor(col("__rr"))) * (col("__xc") - col("__xf")))
      .select(grp ++ Seq(col("q"), col("quantile")): _*)
  }

  /** ClickHouse `quantileExactWeighted(level)(x, w)`: the smallest
    * value whose CUMULATIVE WEIGHT reaches level·totalWeight (discrete
    * selection — no interpolation, per upstream's QuantileExactWeighted
    * scan). Same scale shape as [[exactQuantiles]]: one weighted
    * value-count shuffle, then per-group windows over the DISTINCT
    * values only. One output row per group and q.
    */
  def exactQuantilesWeighted(df: DataFrame, groupCols: Seq[String],
      value: Column, weight: Column, qs: Seq[Double]): DataFrame = {
    val grp = groupCols.map(col)
    val vc = df.select(grp ++ Seq(value.cast("double").as("__v"),
        weight.cast("long").as("__w")): _*)
      .filter(col("__v").isNotNull && col("__w").isNotNull)
      .groupBy(grp :+ col("__v"): _*).agg(sum(col("__w")).as("__w"))
    val byVal = Window.partitionBy(grp: _*).orderBy(col("__v"))
    val whole = Window.partitionBy(grp: _*)
    val cum = vc
      .withColumn("__cw", sum(col("__w")).over(
        byVal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__tw", sum(col("__w")).over(whole))
    val qdf = {
      val spark = df.sparkSession
      import spark.implicits._
      qs.toDF("q")
    }
    cum.crossJoin(broadcast(qdf))
      .groupBy(grp :+ col("q"): _*)
      .agg(min(when(col("__cw") >= col("q") * col("__tw"), col("__v")))
        .as("quantile"))
      .select(grp ++ Seq(col("q"), col("quantile")): _*)
  }
}
