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

  test("PPM codec: round-trip, comment headers, exact gradient luminance") {
    // 2x2 gradient with known per-pixel luma
    val px = Array[Int](
      255, 0, 0, /**/ 0, 255, 0,
      0, 0, 255, /**/ 10, 20, 30).map(_.toByte)
    val img = Multimodal.decodePpm(Multimodal.encodePpm(2, 2, 255, px))
    assert(img.width == 2 && img.height == 2 && img.maxval == 255)
    // Rec.709 integer weights: (2126*255 + 7152*255 + 722*255 +
    //   2126*10 + 7152*20 + 722*30) / (10000 * 4)
    val expected = (2126L * 255 + 7152L * 255 + 722L * 255 +
      2126L * 10 + 7152L * 20 + 722L * 30) / (10000.0 * 4)
    assert(img.meanLuma == expected)

    // header with comments and loose whitespace parses identically
    val withComments = ("P6\n# a comment\n2 # inline\n 2\n# more\n255\n"
      .getBytes("US-ASCII") ++ px)
    val img2 = Multimodal.decodePpm(withComments)
    assert(img2 == img)

    // constant-value image: mean luma IS the value (weights sum to 10000)
    val const = Multimodal.decodePpm(
      Multimodal.encodePpm(3, 5, 255, Array.fill(45)(200.toByte)))
    assert(const.meanLuma == 200.0)

    intercept[IllegalArgumentException](
      Multimodal.decodePpm("P5\n1 1\n255\n".getBytes ++ Array[Byte](0)))
    intercept[IllegalArgumentException]( // truncated payload
      Multimodal.decodePpm("P6\n2 2\n255\n".getBytes ++ Array[Byte](1, 2, 3)))
  }

  test("WAV codec: round-trip, unknown chunks skipped, exact RMS/duration") {
    val samples = Array[Short](1000, -1000, 1000, -1000, 0, 0, 0, 0)
    val au = Multimodal.decodeWav(Multimodal.encodeWav(8000, 1, samples))
    assert(au.channels == 1 && au.sampleRate == 8000 && au.bitsPerSample == 16)
    assert(au.nFrames == 8)
    assert(au.durationMs == 8L * 2 * 1000 / 16000)
    assert(au.rms == math.sqrt(4.0 * 1000 * 1000 / 8))

    // constant amplitude: RMS IS the amplitude
    val const = Multimodal.decodeWav(
      Multimodal.encodeWav(44100, 2, Array.fill(100)(321.toShort)))
    assert(const.rms == 321.0 && const.channels == 2 && const.nFrames == 50)

    // an unknown chunk (odd-sized, padded) between WAVE and fmt is skipped
    val canonical = Multimodal.encodeWav(8000, 1, samples)
    val bb = java.nio.ByteBuffer.allocate(canonical.length + 8 + 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(canonical, 0, 12) // RIFF<size>WAVE
    bb.put("LIST".getBytes("US-ASCII")).putInt(3)
      .put(Array[Byte](7, 8, 9, 0)) // 3 bytes + pad
    bb.put(canonical, 12, canonical.length - 12)
    val withExtra = bb.array()
    val au2 = Multimodal.decodeWav(withExtra)
    assert(au2.copy() == au)

    intercept[IllegalArgumentException]( // not RIFF
      Multimodal.decodeWav(Array.fill[Byte](48)(0)))
  }

  test("audioWindowFeatures: exact RMS/ZCR on constant, square, and short waves") {
    // 8000 Hz mono, 250ms windows → 2000 samples per window
    val const = Multimodal.encodeWav(8000, 1, Array.fill(4100)(700.toShort))
    val square = Multimodal.encodeWav(8000, 1,
      Array.tabulate(6000)(i => if (i % 2 == 0) 300.toShort else (-300).toShort))
    val short = Multimodal.encodeWav(8000, 1, Array.fill(1999)(5.toShort))
    val ds = spark.createDataset(Seq(
      (1L, const), (2L, square), (3L, short)))
    val out = Multimodal.audioWindowFeatures(ds, windowMs = 250)
      .collect().map(f => f.doc_id -> f).toMap
    // constant: 2 full windows (trailing 100 samples dropped), RMS =
    // amplitude exactly, no crossings
    assert(out(1L).n_windows == 2)
    assert(out(1L).rms_mean == 700.0 && out(1L).zcr_mean == 0.0)
    // square wave: RMS = amplitude, every consecutive pair crosses
    assert(out(2L).n_windows == 3)
    assert(out(2L).rms_mean == 300.0 && out(2L).zcr_mean == 1.0)
    // below one window: no features
    assert(out(3L).n_windows == 0 && out(3L).rms_mean == 0.0)
  }

  test("decodeMedia: sniff-dispatch over a Dataset, batch-size independent") {
    val rows = Seq.tabulate(12) { i =>
      val bytes =
        if (i % 2 == 0)
          Multimodal.encodePpm(4, 3, 255, Array.fill(36)((i * 17 % 251).toByte))
        else Multimodal.encodeWav(8000, 1, Array.fill(64 + i)((i * 31).toShort))
      (i.toLong, bytes)
    }
    val ds = spark.createDataset(rows).repartition(3)
    val a = Multimodal.decodeMedia(ds, batchSize = 64).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeMedia(ds, batchSize = 1).collect().sortBy(_.doc_id)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 12)
    assert(a.count(_.kind == "image") == 6)
    a.filter(_.kind == "image").foreach(m => assert(m.width == 4 && m.height == 3))
    a.filter(_.kind == "audio").foreach(m => assert(m.sample_rate == 8000))
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

  test("PPM resize: integer nearest-neighbor sampling, exact bytes") {
    val w = 5; val h = 4
    val px = Array.tabulate(w * h * 3)(k => ((k * 11) % 256).toByte)
    val src = Multimodal.encodePpm(w, h, 255, px)
    val rs = Multimodal.resizePpm(src, 2, 2)
    val (rw, rh) = (Multimodal.decodePpm(rs).width, Multimodal.decodePpm(rs).height)
    assert(rw == 2 && rh == 2)
    val pay = rs.drop(rs.length - 2 * 2 * 3)
    // dest (X,Y) samples src (X*5/2, Y*4/2): (0,0) (2,0) (0,2) (2,2)
    for ((srcIdx, d) <- Seq((0, 0), (2, 1), (2 * 5, 2), (2 * 5 + 2, 3)))
      for (c <- 0 to 2)
        assert(pay(d * 3 + c) == px(srcIdx * 3 + c), s"pixel $d ch $c")
    // upscale repeats source pixels, never reads out of bounds
    val up = Multimodal.resizePpm(src, 11, 9)
    assert(Multimodal.decodePpm(up).width == 11)
  }

  test("y4m codec: header tags, frame sampling, loud failures") {
    val frames = Seq.tabulate(7)(f => Array.tabulate(6)(p => (f * 10 + p).toByte))
    val v = Multimodal.sampleY4mFrames(Multimodal.encodeY4m(3, 2, frames), 3)
    assert(v.width == 3 && v.height == 2 && v.nFrames == 7)
    assert(v.sampledFrames == Seq(0, 3, 6))
    assert(v.frameLumaSums == Seq(0 + 1 + 2 + 3 + 4 + 5,
      30 + 31 + 32 + 33 + 34 + 35, 60 + 61 + 62 + 63 + 64 + 65))
    // stride 1 keeps everything; stride > n keeps only frame 0
    assert(Multimodal.sampleY4mFrames(
      Multimodal.encodeY4m(3, 2, frames), 1).sampledFrames.length == 7)
    assert(Multimodal.sampleY4mFrames(
      Multimodal.encodeY4m(3, 2, frames), 99).sampledFrames == Seq(0))
    // non-mono colorspace and truncated payload fail loudly
    intercept[IllegalArgumentException] {
      Multimodal.sampleY4mFrames(
        "YUV4MPEG2 W2 H2 C420jpeg\nFRAME\nabcd".getBytes("US-ASCII"), 1)
    }
    intercept[IllegalArgumentException] {
      Multimodal.sampleY4mFrames(
        "YUV4MPEG2 W2 H2 Cmono\nFRAME\nab".getBytes("US-ASCII"), 1)
    }
  }
}
