package graft

import graft.ops.SkipIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-level data-skipping index (SURVEY §2.1 secondary indexes):
  * pruning must be LOSSLESS (skip-scan ≡ full filter) and must
  * actually prune (range-clustered layout → few candidate files).
  */
class SkipIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dest = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft_skipidx_spec"
    val df = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    SkipIndex.build(df, d, "l_partkey", nParts = 8)
    d
  }

  test("skip-scan equals the full filter, file for file") {
    val full = Tables(spark, "/root/testdata/sf0.001", "lineitem")
    for (key <- Seq(1L, 97L, 199L)) {
      val viaIdx = SkipIndex.scanEq(spark, dest, "l_partkey", key)
        .agg(count(lit(1)), coalesce(sum($"l_quantity"), lit(0.0)).cast("double"))
        .as[(Long, Double)].first()
      val direct = full.filter($"l_partkey" === key)
        .agg(count(lit(1)), coalesce(sum($"l_quantity"), lit(0.0)).cast("double"))
        .as[(Long, Double)].first()
      assert(viaIdx == direct, s"key $key")
    }
  }

  test("range-clustered layout prunes most files on equality") {
    val total = spark.read.parquet(s"$dest/data").inputFiles.length
    val cand = SkipIndex.candidateFiles(spark, dest, 97L)
    assert(total >= 8)
    assert(cand.nonEmpty && cand.length * 2 <= total,
      s"expected <= ${total / 2} candidate files, got ${cand.length} of $total")
  }

  test("absent value short-circuits to zero files and empty result") {
    val cand = SkipIndex.candidateFiles(spark, dest, -42L)
    assert(cand.isEmpty)
    val out = SkipIndex.scanEq(spark, dest, "l_partkey", -42L)
    assert(out.count() == 0)
    assert(out.schema.fieldNames.contains("l_quantity"))
  }

  test("bloom index: lossless on present values, prunes hard on absent ones") {
    val d3 = s"${System.getProperty("java.io.tmpdir")}/graft_skipidx_bloom"
    SkipIndex.buildBloom(Tables(spark, "/root/testdata/sf0.001", "customer"),
      d3, "c_name", nParts = 8)
    val total = spark.read.parquet(s"$d3/data").inputFiles.length
    for (name <- Seq("Customer#000000000", "Customer#000000042",
        "Customer#000000149")) {
      val viaIdx = SkipIndex.scanEqBloom(spark, d3, "c_name", name)
        .select("c_custkey").as[Long].collect().toSeq
      val direct = Tables(spark, "/root/testdata/sf0.001", "customer")
        .filter($"c_name" === name).select("c_custkey").as[Long].collect().toSeq
      assert(viaIdx == direct && viaIdx.nonEmpty, name)
      // unique value → ~1 true file; allow a couple of false positives
      val cand = SkipIndex.candidateFilesBloom(spark, d3, name)
      assert(cand.length * 2 <= total, s"$name: ${cand.length} of $total")
    }
    // absent value: expect (near-)total pruning and an empty result
    val ghost = SkipIndex.candidateFilesBloom(spark, d3, "Customer#999999999")
    assert(ghost.length * 2 <= total)
    assert(SkipIndex.scanEqBloom(spark, d3, "c_name", "Customer#999999999")
      .count() == 0)
  }

  test("set overflow degrades to minmax-only, still lossless") {
    val d2 = s"${System.getProperty("java.io.tmpdir")}/graft_skipidx_spec2"
    SkipIndex.build(Tables(spark, "/root/testdata/sf0.001", "lineitem"),
      d2, "l_partkey", nParts = 4, setCapacity = 2)
    val viaIdx = SkipIndex.scanEq(spark, d2, "l_partkey", 97L).count()
    val direct = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .filter($"l_partkey" === 97L).count()
    assert(viaIdx == direct)
  }
}
