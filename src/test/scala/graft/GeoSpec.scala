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
  }
}
