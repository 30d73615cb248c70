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

  /** ClickHouse `LIMIT [offset,] n BY keys`: rows offset+1 … offset+n
    * per key group in the given order.
    */
  def limitBy(df: DataFrame, keys: Seq[String], n: Int, order: Seq[Column],
      offset: Int = 0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset && col("__rn") <= offset + n).drop("__rn")
  }

  /** `DISTINCT ON (keys)` with explicit ordering (deterministic,
    * unlike a bare dropDuplicates): the first row per key group.
    */
  def distinctOn(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame =
    limitBy(df, keys, 1, order)

  /** VersionedCollapsingMergeTree FINAL: rows carry a `version` and a
    * ±1 `sign`; a cancel row must mirror the insert it cancels (same
    * key, version, payload — upstream
    * VersionedCollapsingSortedAlgorithm's contract). FINAL retains
    * EVERY (key, version) whose signs net positive — keys with several
    * live versions keep them all, exactly upstream's read-time
    * collapse. Payload columns (all others) are taken with max — exact
    * under the mirror contract. One groupBy shuffle on (keys,
    * version).
    */
  def versionedCollapseFinal(df: DataFrame, keys: Seq[String],
      versionCol: String, signCol: String): DataFrame = {
    val payload = df.columns.filterNot(c =>
      keys.contains(c) || c == versionCol || c == signCol)
    df.groupBy((keys :+ versionCol).map(col): _*)
      .agg(sum(col(signCol)).as("__net"),
        payload.map(c => max(col(c)).as(c)): _*)
      .filter(col("__net") > 0)
      .drop("__net")
  }

  /** LATEST-STATE view over [[versionedCollapseFinal]]: one row per
    * key — the HIGHEST net-positive version. This is the common
    * "current state" query on a versioned stream, NOT what upstream
    * FINAL returns when several versions of a key are live (use
    * [[versionedCollapseFinal]] for that). Adds one per-key window
    * over the few surviving versions — a second shuffle on the same
    * key set.
    */
  def versionedCollapse(df: DataFrame, keys: Seq[String],
      versionCol: String, signCol: String): DataFrame =
    // Hash-partition by the collapse keys ONCE up front: the (keys,
    // version) net aggregation and the latest-version window both
    // accept HashPartitioning(keys) (its expressions are a subset of
    // either clustering), so the whole collapse runs on ONE exchange
    // instead of two back-to-back ones (agg on keys+version, then
    // window on keys) — r20, guide §2.4 "two operations keyed the
    // same way can share one exchange". Row-identical: repartition
    // only moves rows.
    distinctOn(
      versionedCollapseFinal(df.repartition(keys.map(col): _*),
        keys, versionCol, signCol),
      keys, Seq(col(versionCol).desc))

  /** MergeTree `TTL expr` at query time: row TTL drops rows whose
    * `ts` is older than `now − keepLast`, where "now" is the frame's
    * own max(ts) — deterministic, unlike wall-clock TTL, and exactly
    * what a merge would have applied at the moment the newest part was
    * written. The max is a 1-row broadcast scalar, so the filter stays
    * a pushed-down scan predicate shape at any size.
    */
  def applyRowTtl(df: DataFrame, tsCol: String, keepLast: String): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("__now"))
    df.crossJoin(broadcast(mx))
      .filter(col(tsCol) > col("__now") - expr(s"INTERVAL $keepLast"))
      .drop("__now")
  }

  /** MergeTree COLUMN TTL: past the horizon the column reverts to its
    * default (NULL here) while the row survives — `TTL ts + INTERVAL n
    * ... TO COLUMN` semantics.
    */
  def applyColumnTtl(df: DataFrame, tsCol: String, keepLast: String,
      cols: Seq[String]): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("__now"))
    val horizoned = df.crossJoin(broadcast(mx))
    cols.foldLeft(horizoned) { (d, c) =>
      d.withColumn(c,
        when(col(tsCol) > col("__now") - expr(s"INTERVAL $keepLast"), col(c)))
    }.drop("__now")
  }

  /** `ORDER BY date WITH FILL STEP 1 day` over an aggregated frame:
    * generates the full calendar between the frame's min and max date
    * (one 1-row cross join, then explode) and left-joins the data in,
    * filling absent rows with `fillValue`. The generate side is tiny
    * (one row per step), so the join broadcasts.
    */
  /** `ORDER BY x WITH FILL FROM lo TO hi STEP s` over a NUMERIC axis
    * (CH's other fill form next to the calendar one). ClickHouse
    * semantics: ORIGINAL rows all survive (even off the step grid);
    * grid points absent from the data are ADDED with fill defaults.
    * Shape: a broadcast anti-join finds the missing grid points, then
    * a union — no shuffle of the data side at all.
    */
  def withFillStep(df: DataFrame, numCol: String, from: Long, to: Long,
      step: Long, fill: Map[String, Column]): DataFrame = {
    val series = df.sparkSession.range(from, to, step)
      .select(col("id").cast(df.schema(numCol).dataType).as(numCol))
    // Only the generated series is guaranteed small — df may be any
    // size. Broadcast the series twice: a semi-join bounds the present
    // grid points (≤ series size), then the anti-join against that
    // bounded set finds the missing ones. Neither join ever builds a
    // hash table from the data side.
    val present = df.select(numCol)
      .join(broadcast(series), Seq(numCol), "left_semi").distinct()
    val missing = series.join(broadcast(present), Seq(numCol), "left_anti")
    val added = missing.select(df.columns.map { c =>
      if (c == numCol) col(c)
      else fill.getOrElse(c, lit(null)).cast(df.schema(c).dataType).as(c)
    }.toIndexedSeq: _*)
    df.unionByName(added)
  }

  /** `ORDER BY x WITH FILL STEP s STALENESS st` (CH 23.12+): filler
    * rows are generated AFTER each original row at the step stride,
    * only while their distance from that original row stays UNDER
    * `st`, and never at or past the next original row — there is no
    * global grid, so an isolated original row trails at most st/s
    * filler rows. The axis is the (bounded, already-aggregated)
    * ORDER BY series — the one `lead` window over its DISTINCT
    * values is the same bounded-series single-partition contract the
    * other fill forms use.
    */
  def withFillStaleness(df: DataFrame, numCol: String, step: Long,
      staleness: Long, fill: Map[String, Column]): DataFrame = {
    require(step > 0 && staleness > 0,
      "WITH FILL STALENESS needs positive STEP and STALENESS")
    require(Set("tinyint", "smallint", "int", "bigint")(
      df.schema(numCol).dataType.simpleString),
      s"WITH FILL STALENESS needs an integral axis; '$numCol' is " +
        s"${df.schema(numCol).dataType.simpleString} (a fractional axis " +
        "would silently truncate)")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("__v"))
    val origs = df.select(col(numCol).cast("long").as("__v")).distinct()
      .withColumn("__next", lead(col("__v"), 1).over(w))
    val missing = origs.select(explode(expr(
      s"""CASE WHEN least(__v + $staleness - 1,
                         coalesce(__next - 1, __v + $staleness - 1))
                >= __v + $step
          THEN sequence(__v + $step,
                        least(__v + $staleness - 1,
                              coalesce(__next - 1, __v + $staleness - 1)),
                        CAST($step AS BIGINT))
          ELSE array() END""")).as("__g"))
      .select(col("__g").cast(df.schema(numCol).dataType).as(numCol))
    val added = missing.select(df.columns.map { c =>
      if (c == numCol) col(c)
      else fill.getOrElse(c, lit(null)).cast(df.schema(c).dataType).as(c)
    }.toIndexedSeq: _*)
    df.unionByName(added)
  }

  def withFillDays(df: DataFrame, dateCol: String, fill: Map[String, Column]): DataFrame =
    withFillInterval(df, dateCol, "INTERVAL 1 DAY", fill)

  /** Calendar-axis WITH FILL at an arbitrary INTERVAL stride: the grid
    * spans the data's own [min, max] (one 1-row aggregate), generated
    * with `sequence()` and broadcast — grid size = span/step, never
    * O(rows). Data rows must sit ON grid points (truncate the axis in
    * the query, as CH expects of a time-axis WITH FILL).
    */
  def withFillInterval(df: DataFrame, tsCol: String, step: String,
      fill: Map[String, Column]): DataFrame = {
    val mm = df.agg(min(col(tsCol)).as("__lo"), max(col(tsCol)).as("__hi"))
    val cal = mm.select(explode(sequence(col("__lo"), col("__hi"),
      expr(step))).as(tsCol))
    val joined = broadcast(cal).join(df, Seq(tsCol), "left")
    fill.foldLeft(joined) { case (d, (c, v)) =>
      d.withColumn(c, coalesce(col(c), v))
    }
  }
}
