package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ClickHouse mutations (`ALTER TABLE … DELETE / UPDATE`): upstream
  * rewrites whole parts asynchronously; the Spark-native analog is a
  * copy-on-write SNAPSHOT — filter/patch the immutable parquet into a
  * new directory and repoint readers. Each mutation is one distributed
  * scan+write (no row-level locking, no tombstones), which is exactly
  * the part-rewrite cost model ClickHouse documents, and the pattern
  * scales: at 100 TB the rewrite is a partition-parallel job and
  * untouched partitions can be skipped by pushing `cond` into
  * partition pruning.
  */
object Mutations {

  /** `ALTER TABLE … DELETE WHERE cond` → snapshot without the matching
    * rows. Returns the new snapshot as a DataFrame.
    */
  def deleteWhere(df: DataFrame, cond: Column, dest: String): DataFrame = {
    df.filter(!coalesce(cond, lit(false))).write.mode("overwrite").parquet(dest)
    df.sparkSession.read.parquet(dest)
  }

  /** `ALTER TABLE … UPDATE c1 = e1, … WHERE cond` → snapshot with the
    * assignments applied to matching rows.
    */
  def updateWhere(df: DataFrame, cond: Column, set: Map[String, Column],
      dest: String): DataFrame = {
    val patched = set.foldLeft(df) { case (d, (name, value)) =>
      d.withColumn(name, when(coalesce(cond, lit(false)), value).otherwise(col(name)))
    }
    patched.write.mode("overwrite").parquet(dest)
    df.sparkSession.read.parquet(dest)
  }
}
