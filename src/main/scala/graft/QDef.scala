package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One declared operator/query from SURVEY.md §2: a Spark
  * implementation plus (where SQL-expressible) its DuckDB oracle twin.
  * Column names MUST match between the two — the driver sorts columns
  * by name before hashing.
  */
final case class QDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Oracle SQL computed at DUMP time instead of registry-build time —
      * for the rare oracle whose literal constants are data-derived
      * (e.g. pipe_ann_ivf inlines the cached k-means centroids). Takes
      * precedence over [[oracle]] when it yields Some. Must be cheap
      * and side-effect-free when its inputs are already cached, and
      * return None rather than throw when they aren't computable.
      */
    dynOracle: Option[() => Option[String]] = None)

/** Determinism helpers shared by declared queries and their oracles.
  *
  * Floating-point sums depend on partition/merge order, so any SUM/AVG
  * over a double column is computed exactly in DECIMAL(22,6), cast back
  * to double, and rounded — identical in Spark and DuckDB regardless of
  * execution order (SURVEY.md §7.4 item 3). This also holds at 100 TB:
  * decimal partial aggregation is associative, so Spark's partial/final
  * split over any number of executors gives bit-identical results.
  */
object Det {
  private val D = DecimalType(22, 6)

  /** Order-independent sum of a double expression, rounded to 4dp. */
  def dsum(c: Column): Column = round(sum(c.cast(D)).cast("double"), 4)

  /** Order-independent mean, rounded to 4dp. */
  def davg(c: Column): Column =
    round(sum(c.cast(D)).cast("double") / count(lit(1)), 4)

  /** DuckDB twin of [[dsum]]. */
  def sqlSum(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(22,6))) AS DOUBLE), 4)"

  /** DuckDB twin of [[davg]]. */
  def sqlAvg(e: String): String =
    s"round(CAST(sum(CAST(($e) AS DECIMAL(22,6))) AS DOUBLE) / count(*), 4)"
}
