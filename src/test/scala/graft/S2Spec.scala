package graft

import graft.functions.{GraftFunctions, S2Math}
import org.scalatest.funsuite.AnyFunSuite

/** S2 cell geometry: pinned against the ClickHouse-documented vectors
  * (the same library CH wraps), plus the structural properties that
  * fully determine the Hilbert tables — continuity (consecutive curve
  * positions are grid neighbors), hierarchy (parent contains child),
  * round-trip (decode lands inside the encoding cell), and
  * neighbor adjacency across face seams.
  */
class S2Spec extends AnyFunSuite {

  test("geoToS2 / s2ToGeo match the ClickHouse-documented vectors") {
    // SELECT geoToS2(37.79506683, 55.71290588) = 4704772434919038107
    assert(S2Math.geoToS2(37.79506683, 55.71290588) == 4704772434919038107L)
    // s2ToGeo(4704772434919038107) = (37.79506681471008, 55.7129059052841)
    val (lon, lat) = S2Math.s2ToGeo(4704772434919038107L)
    assert(math.abs(lon - 37.79506681471008) < 1e-12)
    assert(math.abs(lat - 55.7129059052841) < 1e-12)
  }

  test("negative: the pinned vector bites — nudged input changes the cell") {
    assert(S2Math.geoToS2(37.79506683 + 1e-6, 55.71290588) != 4704772434919038107L)
    assert(S2Math.geoToS2(37.79506683, 55.71290588 + 1e-6) != 4704772434919038107L)
  }

  test("leaf round-trip: decode lands within a leaf cell of the input") {
    // leaf cells are < 1e-5 degrees on a side everywhere
    val pts = Seq((10.40744, 57.64911), (-122.41942, 37.77493),
      (151.20699, -33.86785), (0.01, 0.01), (-179.95, 89.95),
      (179.95, -89.95), (-0.05, -0.05), (90.05, 0.05))
    for ((lon, lat) <- pts) {
      val id = S2Math.geoToS2(lon, lat)
      assert(S2Math.level(id) == 30)
      val (lon2, lat2) = S2Math.s2ToGeo(id)
      assert(math.abs(lat2 - lat) < 1e-5, s"lat drift at ($lon, $lat)")
      val dLon = math.abs(lon2 - lon)
      assert(math.min(dLon, 360 - dLon) * math.cos(math.toRadians(lat)) < 1e-5,
        s"lon drift at ($lon, $lat)")
      // re-encoding the center reproduces the id
      assert(S2Math.geoToS2(lon2, lat2) == id)
    }
  }

  test("Hilbert continuity: consecutive curve positions are ij neighbors") {
    // Walk 4096 consecutive level-30 positions from several seeds on
    // each face: consecutive leaf cells must be edge-adjacent in the
    // face grid (|di| + |dj| == 1). This property holds ONLY for a
    // correct Hilbert table pair — any wrong entry breaks adjacency
    // within a few steps.
    for (f <- 0 to 5; seed <- Seq(0L, 0x155555555555555L, 0x0F0F0F0F0F0F0FL)) {
      var prev: Option[(Int, Int)] = None
      var pos = seed
      var step = 0
      while (step < 4096) {
        val id = (f.toLong << 61) | (pos << 1) | 1L
        val (_, i, j) = S2Math.toFaceIJ(id)
        prev.foreach { case (pi, pj) =>
          assert(math.abs(i - pi) + math.abs(j - pj) == 1,
            s"discontinuity at face $f pos $pos")
        }
        prev = Some((i, j))
        pos += 1
        step += 1
      }
    }
  }

  test("hierarchy: parent contains child, levels and intersection agree") {
    val id = S2Math.geoToS2(10.40744, 57.64911)
    var lvl = 30
    var prev = id
    while (lvl > 0) {
      lvl -= 1
      val p = S2Math.parent(id, lvl)
      assert(S2Math.level(p) == lvl)
      assert(S2Math.cellsIntersect(p, id) && S2Math.cellsIntersect(id, p))
      assert(S2Math.cellsIntersect(p, prev))
      // the parent's center stays inside the parent cell: re-encoding
      // it and taking the ancestor at lvl reproduces the parent
      val (clon, clat) = S2Math.s2ToGeo(p)
      assert(S2Math.parent(S2Math.geoToS2(clon, clat), lvl) == p)
      prev = p
    }
    // disjoint cells do not intersect: two distant points at level 10
    val a = S2Math.parent(S2Math.geoToS2(10.0, 57.0), 10)
    val b = S2Math.parent(S2Math.geoToS2(-122.0, 37.0), 10)
    assert(!S2Math.cellsIntersect(a, b) && !S2Math.cellsIntersect(b, a))
  }

  test("neighbors: 4 distinct cells at the same level, centers adjacent") {
    val pts = Seq((10.40744, 57.64911), (-122.41942, 37.77493),
      (0.05, 0.05), (-179.95, 0.05), (0.05, 89.95), (0.05, -89.95),
      (135.05, 45.05)) // near-corner and near-seam cases exercise wrap
    for ((lon, lat) <- pts; lvl <- Seq(5, 12, 20)) {
      val cell = S2Math.parent(S2Math.geoToS2(lon, lat), lvl)
      val nbrs = S2Math.getEdgeNeighbors(cell)
      assert(nbrs.length == 4)
      assert(nbrs.distinct.length == 4, s"duplicate neighbors at ($lon,$lat,$lvl)")
      assert(!nbrs.contains(cell))
      val (cx, cy, cz) = S2Math.centerXYZ(cell)
      for (n <- nbrs) {
        assert(S2Math.level(n) == lvl)
        assert(!S2Math.cellsIntersect(n, cell))
        // adjacency: center distance is within ~2.2 cell diagonals
        // (cells are not uniform in size; seam neighbors differ)
        val (nx, ny, nz) = S2Math.centerXYZ(n)
        val chord = math.sqrt(
          (nx - cx) * (nx - cx) + (ny - cy) * (ny - cy) + (nz - cz) * (nz - cz))
        val cellEdge = 2.0 / (1 << lvl) // upper bound on edge length (radians-ish)
        assert(chord < 2.2 * cellEdge, s"far neighbor at ($lon,$lat,$lvl)")
      }
      // interior cells: mutual adjacency (the neighbor sees us back)
      val fij = S2Math.toFaceIJ(cell)
      val size = 1 << (30 - lvl)
      val interior = fij._2 >= size && fij._2 < (1 << 30) - size &&
        fij._3 >= size && fij._3 < (1 << 30) - size
      if (interior) {
        for (n <- nbrs) assert(S2Math.getEdgeNeighbors(n).contains(cell))
      }
    }
  }

  test("every face is reachable and ids carry the face in the top bits") {
    val faces = Seq(
      (0.0, 0.0) -> 0, (90.0, 0.0) -> 1, (45.0, 89.9) -> 2,
      (180.0, 0.0) -> 3, (-90.0, 0.0) -> 4, (45.0, -89.9) -> 5)
    for (((lon, lat), f) <- faces) {
      assert((S2Math.geoToS2(lon, lat) >>> 61).toInt == f, s"face at ($lon,$lat)")
    }
  }

  test("cap and rect containment") {
    val center = S2Math.geoToS2(10.0, 50.0)
    val near = S2Math.geoToS2(10.5, 50.2) // ~40 km away
    val far = S2Math.geoToS2(20.0, 55.0) // ~850 km away
    assert(S2Math.capContains(center, 1.0, near))
    assert(!S2Math.capContains(center, 1.0, far))
    assert(S2Math.capContains(center, 10.0, far))
    assert(S2Math.capContains(center, 0.0, center))

    val lo = S2Math.geoToS2(5.0, 45.0)
    val hi = S2Math.geoToS2(15.0, 55.0)
    assert(S2Math.rectContains(lo, hi, near))
    assert(!S2Math.rectContains(lo, hi, far))
    // antimeridian wrap: lon interval [170, -170]
    val wlo = S2Math.geoToS2(170.0, -10.0)
    val whi = S2Math.geoToS2(-170.0, 10.0)
    assert(S2Math.rectContains(wlo, whi, S2Math.geoToS2(179.5, 0.0)))
    assert(S2Math.rectContains(wlo, whi, S2Math.geoToS2(-179.5, 0.0)))
    assert(!S2Math.rectContains(wlo, whi, S2Math.geoToS2(0.0, 0.0)))
  }

  test("s2 expressions run through codegen end-to-end") {
    val spark = TestSpark.spark
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq((37.79506683, 55.71290588)).toDF("lon", "lat")
      .selectExpr(
        "geo_to_s2(lon, lat) AS id",
        "s2_level(geo_to_s2(lon, lat)) AS lvl",
        "s2_parent(geo_to_s2(lon, lat), 12) AS p12",
        "round(s2_to_geo(geo_to_s2(lon, lat)).lon, 6) AS rlon",
        "s2_cells_intersect(geo_to_s2(lon, lat), s2_parent(geo_to_s2(lon, lat), 4)) AS isx",
        "size(s2_get_neighbors(s2_parent(geo_to_s2(lon, lat), 12))) AS nn",
        "s2_face_ij(geo_to_s2(lon, lat)).face AS face")
      .as[(Long, Int, Long, Double, Boolean, Int, Int)].head()
    assert(r._1 == 4704772434919038107L)
    assert(r._2 == 30)
    assert(S2Math.level(r._3) == 12 && S2Math.cellsIntersect(r._3, r._1))
    assert(math.abs(r._4 - 37.795067) < 1e-9)
    assert(r._5 && r._6 == 4 && r._7 == 2)
  }
}
