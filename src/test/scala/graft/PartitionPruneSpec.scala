package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence (SURVEY §4 partition pruning): hive-style
  * partitioned writes let a filtered read skip whole directories —
  * the Spark analog of MergeTree partition pruning. Asserts the
  * pruning actually shows up in the physical scan, not just that the
  * answer is right.
  */
class PartitionPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("filter on a partition column prunes at the scan") {
    val out = Files.createTempDirectory("graft_part").toString
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(out)

    val purchases = spark.read.parquet(out).filter(col("event_type") === "purchase")
    val scan = purchases.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filters in scan:\n$scan")
    // pruned read returns exactly the partition's rows
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(purchases.count() == expected && expected > 0)
  }
}
