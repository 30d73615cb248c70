package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.scalatest.funsuite.AnyFunSuite

/** Scale evidence (SURVEY §4 partitioning): bucketed tables co-locate
  * join keys at write time, so the join plans with ZERO shuffle
  * exchanges — the Spark analog of ClickHouse's co-located
  * distributed joins, and the 100 TB play for repeated fact⋈fact
  * joins.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of two bucketed tables plans without any Exchange") {
    // warehouse.dir is a static conf — tables land in the session's
    // default warehouse; drop them (PURGE files) when done.
    val dir = "/root/testdata/sf0.001"
    try {
      Tables(spark, dir, "orders").write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables(spark, dir, "lineitem").write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          spark.table("lineitem_b")("l_orderkey") === spark.table("orders_b")("o_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected shuffle-free co-located join, found: ${exchanges.map(_.nodeName)}")
      assert(joined.count() == 6000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b PURGE")
      spark.sql("DROP TABLE IF EXISTS lineitem_b PURGE")
    }
  }
}
