package graft

import graft.ops.{Aggregates, Sketches}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** KMV theta sketches (ops/Sketches + Aggregates.ThetaSketch): exact
  * set algebra below capacity, θ-scaled estimation at capacity, and
  * the mergeability law the Spark partial aggregation relies on.
  */
class ThetaSketchSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  private val setGen: Gen[Set[Int]] =
    Gen.listOf(Gen.choose(0, 400)).map(_.toSet)

  test("hash60 fast path equals the 15-hex-char parse (mh60 contract)") {
    def viaHex(seed: String, x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed|$x".getBytes("UTF-8"))
        .take(8).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      Sketches.hash60("th", s) == viaHex("th", s)
    })
  }

  test("exact regime: estimates and set operations are exact") {
    check(Prop.forAll(setGen, setGen) { (xa, xb) =>
      val k = 1024 // > 401 possible values → always exact
      val a = Sketches.fromItems(k, xa.map(_.toString))
      val b = Sketches.fromItems(k, xb.map(_.toString))
      a.estimate == xa.size &&
        Sketches.unionEstimate(a, b) == (xa ++ xb).size &&
        Sketches.intersectEstimate(a, b) == (xa & xb).size &&
        Sketches.differenceEstimate(a, b) == (xa -- xb).size
    })
  }

  test("approximate regime: ~1/sqrt(k) relative error on deterministic sets") {
    val k = 256
    val nA = 20000
    val nB = 15000
    val overlap = 10000 // A = [0, 20000), B = [10000, 25000)
    val a = Sketches.fromItems(k, (0 until nA).map(i => s"u$i"))
    val b = Sketches.fromItems(k, (overlap until overlap + nB).map(i => s"u$i"))
    assert(!a.isExact && !b.isExact)
    def relErr(est: Double, truth: Double): Double = math.abs(est - truth) / truth
    assert(relErr(a.estimate, nA) < 0.15, s"card ${a.estimate}")
    assert(relErr(Sketches.unionEstimate(a, b), 25000) < 0.15,
      s"union ${Sketches.unionEstimate(a, b)}")
    assert(relErr(Sketches.intersectEstimate(a, b), overlap) < 0.30,
      s"intersect ${Sketches.intersectEstimate(a, b)}")
    assert(relErr(Sketches.differenceEstimate(a, b), nA - overlap) < 0.30,
      s"difference ${Sketches.differenceEstimate(a, b)}")
  }

  test("KMV union is lossless: union of sketches = sketch of union") {
    val k = 64
    val xa = (0 until 500).map(i => s"a$i")
    val xb = (200 until 900).map(i => s"b$i") ++ xa.take(100)
    val direct = Sketches.fromItems(k, (xa ++ xb).distinct)
    val viaUnion = Sketches.union(
      Sketches.fromItems(k, xa), Sketches.fromItems(k, xb))
    assert(direct.values.toSeq == viaUnion.values.toSeq)
  }

  test("aggregator: merge order and compaction points never change finish") {
    val agg = new Aggregates.ThetaSketch(32)
    check(Prop.forAll(Gen.listOf(Gen.choose(0, 300)), Gen.listOf(Gen.choose(0, 300))) {
      (la, lb) =>
        def bld(xs: Seq[Int]) = xs.map(_.toString).foldLeft(agg.zero)(agg.reduce)
        val ab = agg.finish(agg.merge(bld(la), bld(lb))).toSeq
        val ba = agg.finish(agg.merge(bld(lb), bld(la))).toSeq
        val whole = agg.finish(bld(la ++ lb)).toSeq
        ab == ba && ab == whole
    })
  }

  test("aggregator output equals Sketches.fromItems on the same stream") {
    val agg = new Aggregates.ThetaSketch(16)
    val items = (0 until 200).map(i => s"x${i % 90}")
    val viaAgg = agg.finish(items.foldLeft(agg.zero)(agg.reduce)).toSeq
    val direct = Sketches.fromItems(16, items.distinct).values.toSeq
    assert(viaAgg == direct)
  }
}
