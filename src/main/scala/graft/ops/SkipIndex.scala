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

  // ---- bloom_filter skip index -------------------------------------
  // CH's third skip-index kind, for high-cardinality columns where a
  // set(N) always overflows. Per file: an m-bit bloom (k md5-derived
  // hash positions per value, the cross-engine mh60 primitive) stored
  // SPARSELY as (word index → 64-bit word) pairs — built relationally
  // (explode k positions → groupBy(file, word) bit_or(mask) → one
  // map per file), so index construction is one shuffle at any scale
  // and the manifest stays O(files · set-bits/64).

  private val bloomBits = 1 << 15 // m = 32768 bits per file
  private val bloomK = 4

  /** Bit positions of `v` — mh60 with k salts, mod m. Pure function of
    * the value, so build and probe agree anywhere.
    */
  private def bloomPositions(v: String): Seq[Int] =
    (0 until bloomK).map { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$s|$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 15), 16) % bloomBits).toInt
    }

  def buildBloom(df: DataFrame, dest: String, indexCol: String,
                 nParts: Int): Unit = {
    val spark = df.sparkSession
    df.repartition(nParts).write.mode("overwrite").parquet(s"$dest/data")
    // positions spelled with the same md5 bits as bloomPositions
    val posCols = (0 until bloomK).map { s =>
      (conv(substring(md5(concat(lit(s"$s|"), col(indexCol).cast("string"))),
        1, 15), 16, 10).cast("long") % bloomBits).cast("int")
    }
    spark.read.parquet(s"$dest/data")
      .select(input_file_name().as("file"),
        explode(array(posCols: _*)).as("pos"))
      .select(col("file"), (col("pos") / 64).cast("int").as("word"),
        expr("shiftleft(1L, pos % 64)").as("mask"))
      .groupBy("file", "word").agg(bit_or(col("mask")).as("bits"))
      .groupBy("file")
      .agg(map_from_arrays(collect_list(col("word")),
        collect_list(col("bits"))).as("words"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dest/_bloomidx")
  }

  /** Files whose bloom cannot rule out `indexCol = value`. */
  def candidateFilesBloom(spark: SparkSession, dest: String,
                          value: String): Seq[String] = {
    val need = bloomPositions(value).map(p => (p / 64, 1L << (p % 64)))
    val pred = need.map { case (w, m) =>
      (element_at(col("words"), lit(w)).bitwiseAND(lit(m))) === lit(m)
    }.reduce(_ && _)
    spark.read.parquet(s"$dest/_bloomidx")
      .filter(pred).select("file").collect().map(_.getString(0)).toSeq
  }

  def scanEqBloom(spark: SparkSession, dest: String, indexCol: String,
                  value: String): DataFrame = {
    val files = candidateFilesBloom(spark, dest, value)
    val all = spark.read.parquet(s"$dest/data")
    if (files.isEmpty) all.limit(0)
    else spark.read.schema(all.schema).parquet(files: _*)
      .filter(col(indexCol) === lit(value))
  }
}
