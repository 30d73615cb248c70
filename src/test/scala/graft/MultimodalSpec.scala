package graft

import graft.ops.Multimodal
import graft.ops.Multimodal.Asset
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal batch-decode plumbing: schema round-trip, row
  * preservation, determinism, batch-size independence.
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Seq.tabulate(10) { i =>
    Asset(i.toLong, s"payload-$i-${"x" * i}".getBytes("UTF-8"), "en", 100L + i)
  }

  test("decodeFeatures preserves rows and derives deterministic features") {
    val ds = spark.createDataset(assets).repartition(3)
    val out1 = Multimodal.decodeFeatures(ds).collect().sortBy(_.doc_id)
    val out2 = Multimodal.decodeFeatures(ds).collect().sortBy(_.doc_id)
    assert(out1.length == 10)
    assert(out1.toSeq == out2.toSeq)
    assert(out1(3).byte_len == "payload-3-xxx".getBytes("UTF-8").length)
  }

  test("features are independent of batch size (batching is invisible)") {
    val ds = spark.createDataset(assets)
    val big = Multimodal.decodeFeatures(ds, batchSize = 64).collect().sortBy(_.doc_id)
    val tiny = Multimodal.decodeFeatures(ds, batchSize = 1).collect().sortBy(_.doc_id)
    assert(big.toSeq == tiny.toSeq)
  }
}
