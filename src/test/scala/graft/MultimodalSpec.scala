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

  test("frameSample fans out per duration, bounded, no shuffle in plan") {
    val ds = spark.createDataset(assets)
    val frames = Multimodal.frameSample(ds, intervalMs = 1000, maxFrames = 5)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
    val rows = frames.collect()
    // duration stub = n_chars*40ms = ~4s → 4 frames, capped at 5
    val byDoc = rows.groupBy(_.doc_id)
    assert(byDoc.keySet.size == 10)
    byDoc.values.foreach { fs =>
      assert(fs.length >= 1 && fs.length <= 5)
      assert(fs.map(_.frame_idx).sorted.toSeq == (0 until fs.length))
      fs.foreach(f => assert(f.thumb.length == 8))
    }
    // determinism
    assert(frames.collect().map(f => (f.doc_id, f.frame_idx, f.thumb.toSeq)).sortBy(x => (x._1, x._2)).toSeq ==
      rows.map(f => (f.doc_id, f.frame_idx, f.thumb.toSeq)).sortBy(x => (x._1, x._2)).toSeq)
  }

  test("extractEmbeddings yields unit-normalized fixed-dim vectors for ANN") {
    val ds = spark.createDataset(assets)
    val embs = Multimodal.extractEmbeddings(ds, dim = 16).collect()
    assert(embs.length == 10)
    embs.foreach { case (_, v) =>
      assert(v.length == 16)
      val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }
}
