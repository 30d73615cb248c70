package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated fixture tables (TESTDATA.md /
  * FIXTURES.md). Immutable sorted parquet files are the Spark-native
  * analog of ClickHouse MergeTree parts (SURVEY.md §1.1): columnar,
  * immutable, row-group min/max stats ≈ sparse primary index.
  *
  * At 100 TB these reads become partitioned parquet directories; the
  * loader stays the same — Spark's DataSource v2 handles split
  * planning, predicate pushdown and column pruning per file.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is ns-precision parquet; Spark (µs-native) reads it as
    * a long only under `spark.sql.legacy.parquet.nanosAsLong=true` (set
    * in every session we build). Convert ns→µs with INTEGER division —
    * a double division would lose precision at 1e18 ns — matching
    * DuckDB's `CAST(ts AS TIMESTAMP)` truncation (FIXTURES.md trap).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }
}
