package graft

import graft.functions.{GeoMath, GraftFunctions}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Known-answer and geometry tests for the geo expressions: geohash
  * against the classic published examples (Niemeyer's algorithm is
  * fully determined by them), pointInPolygon against hand-checked
  * convex/concave/boundary cases, plus the codegen path end-to-end.
  */
class GeoSpec extends AnyFunSuite {

  test("geohashEncode matches the canonical published examples") {
    // Jutland point — the original geohash.org example
    assert(GeoMath.geohashEncode(10.40744, 57.64911, 11).toString == "u4pruydqqvj")
    // ezs42 — the worked example used across the literature
    assert(GeoMath.geohashEncode(-5.60302734375, 42.60498046875, 5).toString == "ezs42")
    // prefix property: lower precision is a prefix of higher
    val full = GeoMath.geohashEncode(10.40744, 57.64911, 12).toString
    (1 to 11).foreach { p =>
      assert(full.startsWith(GeoMath.geohashEncode(10.40744, 57.64911, p).toString))
    }
  }

  test("geohashDecode inverts encode to within the cell half-width") {
    import org.apache.spark.unsafe.types.UTF8String
    // classic example: ezs42 decodes to the published cell center
    val r = GeoMath.geohashDecode(UTF8String.fromString("ezs42"))
    assert(math.abs(r.getDouble(0) - (-5.60302734375)) < 1e-9) // lon
    assert(math.abs(r.getDouble(1) - 42.60498046875) < 1e-9) // lat
    // round-trip: decode(encode(p, prec)) lands within the cell
    val pts = Seq((10.40744, 57.64911), (-122.41942, 37.77493),
      (151.20699, -33.86785), (0.0, 0.0), (-179.9, 89.9))
    for ((lon, lat) <- pts; prec <- Seq(6, 9, 12)) {
      val h = GeoMath.geohashEncode(lon, lat, prec)
      val back = GeoMath.geohashDecode(h)
      // cell half-widths: lon bits = ceil(5p/2), lat bits = floor(5p/2)
      val lonBits = (5 * prec + 1) / 2
      val latBits = 5 * prec / 2
      assert(math.abs(back.getDouble(0) - lon) <= 180.0 / (1L << lonBits),
        s"lon drift at $h")
      assert(math.abs(back.getDouble(1) - lat) <= 90.0 / (1L << latBits),
        s"lat drift at $h")
      // re-encoding the center reproduces the hash exactly
      assert(GeoMath.geohashEncode(back.getDouble(0), back.getDouble(1), prec)
        .toString == h.toString)
    }
    intercept[IllegalArgumentException](
      GeoMath.geohashDecode(UTF8String.fromString("ezsa2"))) // 'a' not in base32
  }

  test("quadkey: Bing tile-system known answers, prefix hierarchy, round-trip") {
    import org.apache.spark.unsafe.types.UTF8String
    // the canonical Bing documentation example: tile (3, 5) at level 3
    // has quadkey "213"
    assert(GeoMath.quadkeyFromTile(3, 5, 3).toString == "213")
    assert(GeoMath.quadkeyToTile(UTF8String.fromString("213")) == ((3L, 5L, 3)))
    // prefix property: the level-p prefix IS the parent tile's quadkey
    val pts = Seq((10.40744, 57.64911), (-122.41942, 37.77493),
      (151.20699, -33.86785), (0.05, 0.05))
    for ((lon, lat) <- pts) {
      val deep = GeoMath.quadkeyEncode(lon, lat, 16).toString
      (1 to 15).foreach { z =>
        assert(deep.startsWith(GeoMath.quadkeyEncode(lon, lat, z).toString))
      }
      // decode lands in the same tile: re-encoding the center
      // reproduces the quadkey
      val c = GeoMath.quadkeyDecode(UTF8String.fromString(deep))
      assert(GeoMath.quadkeyEncode(c.getDouble(0), c.getDouble(1), 16)
        .toString == deep)
    }
    // quadrant layout at zoom 1: 0=NW 1=NE 2=SW 3=SE
    assert(GeoMath.quadkeyEncode(-90, 45, 1).toString == "0")
    assert(GeoMath.quadkeyEncode(90, 45, 1).toString == "1")
    assert(GeoMath.quadkeyEncode(-90, -45, 1).toString == "2")
    assert(GeoMath.quadkeyEncode(90, -45, 1).toString == "3")
    intercept[IllegalArgumentException](
      GeoMath.quadkeyToTile(UTF8String.fromString("0132x")))
  }

  private def pip(px: Double, py: Double, pts: (Double, Double)*): Boolean =
    GeoMath.pointInPolygon(px, py,
      ArrayData.toArrayData(pts.map(_._1).toArray),
      ArrayData.toArrayData(pts.map(_._2).toArray))

  test("pointInPolygon: square, concave, outside, vertex") {
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(pip(2, 2, sq: _*))
    assert(!pip(5, 2, sq: _*))
    assert(!pip(-1, -1, sq: _*))
    assert(pip(0, 0, sq: _*)) // vertex counts inside
    assert(pip(2, 4, sq: _*)) // on the top horizontal edge counts inside
    assert(pip(2, 0, sq: _*)) // on the bottom horizontal edge
    assert(pip(4, 2, sq: _*)) // on a vertical edge (crossing hit)
    assert(!pip(5, 4, sq: _*)) // collinear with the top edge but past it
    // concave "C" shape: notch cut from the right side
    val c = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 1.0), (1.0, 1.0),
      (1.0, 3.0), (4.0, 3.0), (4.0, 4.0), (0.0, 4.0))
    assert(pip(0.5, 2.0, c: _*)) // in the spine
    assert(!pip(3.0, 2.0, c: _*)) // in the notch
    assert(pip(3.0, 0.5, c: _*)) // in the lower arm
  }

  test("geohashesInBox: covering, sorted, bounded, loud cap") {
    val spark = TestSpark.spark
    Graft.init(spark, "/root/testdata/sf0.001")
    def run1(q: String) = Graft.sql(spark, q).head()
    // covering contract: the encode of ANY point in the box is a
    // member of the cover (the blocking-key property)
    val r = run1("""
      SELECT geohashesInBox(24.48, 40.56, 24.785, 40.81, 4) AS cover,
             geohashEncode(24.48, 40.56, 4) AS p1,
             geohashEncode(24.785, 40.81, 4) AS p2,
             geohashEncode(24.6, 40.7, 4) AS p3""")
    val cover = r.getSeq[String](0)
    assert(cover.nonEmpty && cover.distinct == cover)
    assert(cover == cover.sorted)
    assert(Seq(r.getString(1), r.getString(2), r.getString(3))
      .forall(cover.contains), s"cover $cover misses a member point")
    // cell-count arithmetic: precision 4 → lon step 360/2^10,
    // lat step 180/2^10; this box spans 2 lon × 3 lat cells
    assert(cover.size == 6, s"expected 6 cells, got ${cover.size}: $cover")
    // inverted box → empty; degenerate point box → exactly its cell
    val e = run1("""
      SELECT geohashesInBox(1.0, 1.0, -1.0, -1.0, 5) AS inv,
             geohashesInBox(24.6, 40.7, 24.6, 40.7, 6) AS pt,
             geohashEncode(24.6, 40.7, 6) AS pc""")
    assert(e.getSeq[String](0).isEmpty)
    assert(e.getSeq[String](1) == Seq(e.getString(2)))
    // boxes fully outside the coordinate domain → empty, never a
    // spurious boundary-cell cover (sequence() would run DESCENDING
    // on unclamped indices); straddling boxes clamp to the domain
    val d = run1("""
      SELECT geohashesInBox(185.0, 50.0, 190.0, 55.0, 4) AS east,
             geohashesInBox(-190.0, 50.0, -185.0, 55.0, 4) AS west,
             geohashesInBox(20.0, 95.0, 25.0, 99.0, 4) AS north,
             geohashesInBox(179.5, 50.0, 190.0, 50.2, 4) AS straddle,
             geohashEncode(179.9, 50.1, 4) AS inpt""")
    assert(d.getSeq[String](0).isEmpty && d.getSeq[String](1).isEmpty &&
      d.getSeq[String](2).isEmpty)
    assert(d.getSeq[String](3).contains(d.getString(4)))
    // the loud cap bites: the whole world at precision 8 is ~10^9 cells
    val ex = intercept[Exception](run1(
      "SELECT geohashesInBox(-180.0, -90.0, 180.0, 90.0, 8) AS boom"))
    assert(ex.getMessage.contains("geohashesInBox"))
    // precision outside the geohash 1..12 domain refuses UP FRONT
    // (instead of flowing a degenerate grid into pow/sequence)
    for (p <- Seq(0, -1, 13)) {
      val px = intercept[Exception](run1(
        s"SELECT geohashesInBox(24.0, 40.0, 25.0, 41.0, $p) AS boom"))
      assert(px.getMessage.contains("out of the geohash range"),
        s"precision $p did not refuse: ${px.getMessage}")
    }
  }

  test("geo expressions run through codegen end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((10.40744, 57.64911)).toDF("lon", "lat")
      .selectExpr(
        "geohash_encode(lon, lat, 11) AS gh",
        """point_in_polygon(lon, lat, array(
             struct(CAST(5.0 AS DOUBLE), CAST(50.0 AS DOUBLE)),
             struct(CAST(15.0 AS DOUBLE), CAST(50.0 AS DOUBLE)),
             struct(CAST(15.0 AS DOUBLE), CAST(60.0 AS DOUBLE)),
             struct(CAST(5.0 AS DOUBLE), CAST(60.0 AS DOUBLE)))) AS inside""")
      .as[(String, Boolean)].head()
    assert(r._1 == "u4pruydqqvj")
    assert(r._2)

    // decode through codegen (+ the CH spelling through Graft.sql)
    Graft.init(spark, "/root/testdata/sf0.001")
    val d = Graft.sql(spark,
      "SELECT geohashDecode('u4pruydqqvj').lon AS lon, geohash_decode('u4pruydqqvj').lat AS lat")
      .as[(Double, Double)].head()
    assert(math.abs(d._1 - 10.40744) < 1e-4 && math.abs(d._2 - 57.64911) < 1e-4)
  }

  test("negative: the known answers bite — nudged inputs break them") {
    // scalar_geo_encode is an allowlisted rows-only gate entry: the
    // canonical examples above ARE its correctness check, so prove
    // they discriminate. At precision 11 a geohash cell is ~1e-6°, so
    // a 1e-4 nudge must land in a different cell; a different
    // precision must change the string; and pointInPolygon must flip
    // across an edge at 1e-9.
    assert(GeoMath.geohashEncode(10.40744, 57.64911 + 1e-4, 11).toString
      != "u4pruydqqvj")
    assert(GeoMath.geohashEncode(10.40744 + 1e-4, 57.64911, 11).toString
      != "u4pruydqqvj")
    assert(GeoMath.geohashEncode(10.40744, 57.64911, 10).toString
      != "u4pruydqqvj")
    val sq = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0))
    assert(!pip(4.0 + 1e-9, 2.0, sq: _*)) // just past the right edge
    assert(pip(4.0 - 1e-9, 2.0, sq: _*))  // just inside it
  }
}
