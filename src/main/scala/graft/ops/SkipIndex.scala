package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MergeTree data-skipping ("secondary") indexes, Spark-first.
  *
  * Upstream ClickHouse attaches `minmax` / `set(N)` / `bloom_filter`
  * indexes to granule ranges so a filter on a NON-sort-key column can
  * skip whole granules (src/Storages/MergeTree/MergeTreeIndexMinMax.cpp,
  * MergeTreeIndexSet.cpp). The Spark translation puts the granule at
  * FILE level: parquet row-group stats already give free minmax
  * pruning inside a file, but only a side manifest can prune whole
  * files (and at 100 TB, never opening the file footer is the win —
  * file listing + footer reads dominate highly selective scans).
  *
  * Layout written by [[build]]:
  *   dest/data/part-*.parquet   — the rows, clustered by the caller's
  *                                layout choice (repartitionByRange on
  *                                the index column makes minmax sharp;
  *                                any layout keeps set-pruning sound)
  *   dest/_skipidx/…parquet     — one row per data file:
  *                                (file, lo, hi, vals) where vals is
  *                                the distinct-value set capped at
  *                                `setCapacity` (overflow → null =
  *                                "this file cannot set-prune", the
  *                                same degrade-to-scan contract as
  *                                CH's set(max_rows)).
  *
  * The manifest is itself built distributedly (group-by on
  * input_file_name over one pass) and is O(files), so reading it is a
  * driver-side broadcast-scale operation at any data size.
  */
object SkipIndex {

  def build(df: DataFrame, dest: String, indexCol: String,
            nParts: Int, setCapacity: Int = 4096): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(nParts, col(indexCol))
      .write.mode("overwrite").parquet(s"$dest/data")
    val manifest = spark.read.parquet(s"$dest/data")
      .groupBy(input_file_name().as("file"))
      .agg(min(col(indexCol)).as("lo"), max(col(indexCol)).as("hi"),
        collect_set(col(indexCol)).as("vals0"))
      .withColumn("vals",
        when(size(col("vals0")) > setCapacity, lit(null)).otherwise(col("vals0")))
      .drop("vals0")
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$dest/_skipidx")
  }

  /** Files whose index entry cannot rule out `indexCol = value`. */
  def candidateFiles(spark: SparkSession, dest: String, value: Any): Seq[String] = {
    val lv = lit(value)
    spark.read.parquet(s"$dest/_skipidx")
      .filter(col("lo") <= lv && lv <= col("hi") &&
        (col("vals").isNull || array_contains(col("vals"), lv)))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Equality scan through the skip index: prune files via the
    * manifest, then read ONLY the surviving files (parquet row-group
    * stats + pushed filters still apply inside them). An empty
    * candidate list short-circuits to an empty frame of the right
    * schema without touching any data file.
    */
  def scanEq(spark: SparkSession, dest: String, indexCol: String,
             value: Any): DataFrame = {
    val files = candidateFiles(spark, dest, value)
    val all = spark.read.parquet(s"$dest/data")
    if (files.isEmpty) all.limit(0)
    else spark.read.schema(all.schema).parquet(files: _*)
      .filter(col(indexCol) === lit(value))
  }
}
