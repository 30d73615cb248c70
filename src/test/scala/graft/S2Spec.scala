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

  test("rect algebra: add/union/intersection with antimeridian wrap") {
    def rect(lo: (Double, Double), hi: (Double, Double)): (Long, Long) =
      (S2Math.geoToS2(lo._1, lo._2), S2Math.geoToS2(hi._1, hi._2))
    def geo(id: Long): (Double, Double) = S2Math.s2ToGeo(id)

    // add: a contained point is a no-op; an outside point extends the
    // nearer longitude edge and the latitude span
    val (lo, hi) = rect((5.0, 45.0), (15.0, 55.0))
    val same = S2Math.rectAdd(lo, hi, S2Math.geoToS2(10.0, 50.0))
    assert(same._1 == lo && same._2 == hi)
    val (alo, ahi) = S2Math.rectAdd(lo, hi, S2Math.geoToS2(20.0, 60.0))
    assert(math.abs(geo(alo)._1 - 5.0) < 1e-5 && math.abs(geo(alo)._2 - 45.0) < 1e-5)
    assert(math.abs(geo(ahi)._1 - 20.0) < 1e-5 && math.abs(geo(ahi)._2 - 60.0) < 1e-5)
    // extension picks the NEARER way around: a point at lon 179
    // extends hi (4° up), not lo (174° down)
    val (_, ehi) = S2Math.rectAdd(lo, hi, S2Math.geoToS2(19.0, 50.0))
    assert(math.abs(geo(ehi)._1 - 19.0) < 1e-5)

    // union: contains both inputs; overlapping rects merge simply
    val (blo, bhi) = rect((10.0, 50.0), (25.0, 60.0))
    val (ulo, uhi) = S2Math.rectUnion(lo, hi, blo, bhi)
    assert(math.abs(geo(ulo)._1 - 5.0) < 1e-5 && math.abs(geo(ulo)._2 - 45.0) < 1e-5)
    assert(math.abs(geo(uhi)._1 - 25.0) < 1e-5 && math.abs(geo(uhi)._2 - 60.0) < 1e-5)
    // wrap union: [170, -170] ∪ [-175, -160] = [170, -160]
    val (wlo, whi) = rect((170.0, -10.0), (-170.0, 10.0))
    val (clo, chi) = rect((-175.0, -5.0), (-160.0, 5.0))
    val (wulo, wuhi) = S2Math.rectUnion(wlo, whi, clo, chi)
    assert(math.abs(geo(wulo)._1 - 170.0) < 1e-5)
    assert(math.abs(geo(wuhi)._1 - (-160.0)) < 1e-5)
    // disjoint in longitude: hull takes the shorter gap
    val (dlo, dhi) = rect((-20.0, 45.0), (-10.0, 55.0))
    val (dulo, duhi) = S2Math.rectUnion(lo, hi, dlo, dhi)
    assert(math.abs(geo(dulo)._1 - (-20.0)) < 1e-5 &&
      math.abs(geo(duhi)._1 - 15.0) < 1e-5)

    // intersection: overlap → the shared box; disjoint → None
    val ix = S2Math.rectIntersection(lo, hi, blo, bhi)
    assert(ix.isDefined)
    val (ilo, ihi) = ix.get
    assert(math.abs(geo(ilo)._1 - 10.0) < 1e-5 && math.abs(geo(ilo)._2 - 50.0) < 1e-5)
    assert(math.abs(geo(ihi)._1 - 15.0) < 1e-5 && math.abs(geo(ihi)._2 - 55.0) < 1e-5)
    assert(S2Math.rectIntersection(lo, hi, dlo, dhi).isEmpty) // lng-disjoint
    val (plo, phi) = rect((5.0, -40.0), (15.0, -30.0))
    assert(S2Math.rectIntersection(lo, hi, plo, phi).isEmpty) // lat-disjoint
    // wrap intersection: [170, -170] ∩ [175, -175] = [175, -175]
    val (qlo, qhi) = rect((175.0, -5.0), (-175.0, 5.0))
    val wx = S2Math.rectIntersection(wlo, whi, qlo, qhi).get
    assert(math.abs(geo(wx._1)._1 - 175.0) < 1e-5 &&
      math.abs(geo(wx._2)._1 - (-175.0)) < 1e-5)
  }

  test("cap union: absorption, symmetry, both rims inside") {
    // centers on ONE meridian so the far rim points are exactly
    // collinear with the union center (a longitude offset would be
    // shortened by cos(lat) and land INSIDE the rim)
    val c1 = S2Math.geoToS2(10.0, 50.0)
    val c2 = S2Math.geoToS2(10.0, 58.0)
    // absorption: a huge cap swallows a small one
    assert(S2Math.capUnion(c1, 60.0, c2, 1.0) == ((c1, 60.0)))
    assert(S2Math.capUnion(c1, 1.0, c2, 60.0) == ((c2, 60.0)))
    // general case: result contains both caps' centers AND farthest
    // rim points (center distance + radius ≤ union radius, to fp slack)
    val (uc, ur) = S2Math.capUnion(c1, 2.0, c2, 3.0)
    assert(S2Math.capContains(uc, ur + 1e-9, c1))
    assert(S2Math.capContains(uc, ur + 1e-9, c2))
    // radius = (d + r1 + r2)/2: d = 8° along the meridian, so ur = 6.5°
    // and c1's far rim point (10, 48) sits EXACTLY on the union rim
    assert(math.abs(ur - 6.5) < 1e-6, s"ur = $ur, expected 6.5")
    val far1 = S2Math.geoToS2(10.0, 48.0) // c1's rim, away from c2
    val far2 = S2Math.geoToS2(10.0, 61.0) // c2's rim, away from c1
    assert(S2Math.capContains(uc, ur + 1e-6, far1))
    assert(S2Math.capContains(uc, ur + 1e-6, far2))
    // ...and the minimality side, asserted NEGATIVELY: a union radius
    // regressed 0.2° too small loses both far rim points
    assert(!S2Math.capContains(uc, ur - 0.2, far1),
      "capUnion radius is not minimal: a 0.2°-smaller cap still holds far1")
    assert(!S2Math.capContains(uc, ur - 0.2, far2),
      "capUnion radius is not minimal: a 0.2°-smaller cap still holds far2")
    // symmetry of the slerp construction
    val (uc2, ur2) = S2Math.capUnion(c2, 3.0, c1, 2.0)
    assert(math.abs(ur - ur2) < 1e-9)
    assert(S2Math.cellsIntersect(S2Math.parent(uc, 20), S2Math.parent(uc2, 20)))
    // ANTIPODAL centers: the naive slerp weights cancel (sin d ≈ ulp);
    // the union must still contain both input caps
    val ap1 = S2Math.geoToS2(10.0, 20.0)
    val ap2 = S2Math.geoToS2(-170.0, -20.0)
    val (ac, ar) = S2Math.capUnion(ap1, 10.0, ap2, 10.0)
    assert(ar <= 180.0)
    assert(S2Math.capContains(ac, ar + 1e-9, ap1), "antipodal union lost cap 1")
    assert(S2Math.capContains(ac, ar + 1e-9, ap2), "antipodal union lost cap 2")
    // radius ≥ 180° is the full sphere — contains everything, and a
    // union that reaches it stays clamped
    assert(S2Math.capContains(S2Math.geoToS2(0.0, 10.0), 200.0,
      S2Math.geoToS2(179.99, -9.99)))
    val (_, fr) = S2Math.capUnion(S2Math.geoToS2(0.0, 0.0), 170.0,
      S2Math.geoToS2(30.0, 0.0), 170.0)
    assert(fr == 180.0)
    assert(S2Math.capContains(S2Math.geoToS2(0.0, 0.0), fr,
      S2Math.geoToS2(-179.0, 5.0)))
  }

  test("s2RadiusJoin equals brute force — including seam and pole clusters") {
    val spark = TestSpark.spark
    import spark.implicits._
    // deterministic clusters where lat/lon-grid blocking breaks:
    // the antimeridian belt (wrap pairs), both pole caps (longitude
    // degenerates), a cube-face corner, plus a sparse mid-lat field
    val pts: Seq[(Long, Double, Double)] = (0 until 300).map { k =>
      val g = k % 5
      val u = (k / 5).toDouble
      val (lon, lat) = g match {
        case 0 =>
          val l = 179.3 + 0.023 * u
          (if (l > 180) l - 360 else l, -1.0 + 0.037 * u)
        case 1 => (-120.0 + 0.031 * u, 88.6 + 0.021 * u)
        case 2 => (60.0 + 0.029 * u, -89.8 + 0.02 * u)
        case 3 => (44.3 + 0.027 * u, 44.5 + 0.019 * u)
        case _ => (10.0 + 0.5 * u, 50.0 + 0.013 * u)
      }
      (k.toLong, lon, lat)
    }
    val left = pts.toDF("lid", "lon1", "lat1")
    val right = pts.map { case (id, lon, lat) => (id, lon, lat) }
      .toDF("rid", "lon2", "lat2")
    val blocked = graft.ops.Joins
      .s2RadiusJoin(left, right, "lon1", "lat1", "lon2", "lat2", 30000.0, 7)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // no duplicate pairs (right side carries a single cell key)
    assert(blocked.size == blocked.distinct.size)
    val dist = """2 * 6371000 * asin(sqrt(
        pow(sin(radians(lat2 - lat1) / 2), 2) +
        cos(radians(lat1)) * cos(radians(lat2)) *
        pow(sin(radians(lon2 - lon1) / 2), 2)))"""
    val brute = left.crossJoin(right)
      .filter(org.apache.spark.sql.functions.expr(s"$dist <= 30000.0"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(brute.nonEmpty && brute.size > 300) // clusters really pair up
    assert(blocked.toSet == brute.toSet,
      s"blocked=${blocked.size} brute=${brute.size} " +
        s"missing=${(brute.toSet -- blocked.toSet).take(5)}")
    // the guard bites: a 100 km radius at level 9 must refuse loudly
    val e = intercept[IllegalArgumentException](graft.ops.Joins
      .s2RadiusJoin(left, right, "lon1", "lat1", "lon2", "lat2", 100000.0, 9))
    assert(e.getMessage.contains("coarser level"))
    // out-of-domain levels refuse on the LEVEL, not via a misleading
    // radius message (31..62) or a shift-wrap false pass (64)
    for (lvl <- Seq(-1, 31, 64)) {
      val el = intercept[IllegalArgumentException](graft.ops.Joins
        .s2RadiusJoin(left, right, "lon1", "lat1", "lon2", "lat2", 100.0, lvl))
      assert(el.getMessage.contains("out of the s2 range"),
        s"level $lvl: ${el.getMessage}")
    }
    // reserved output names refuse instead of silently overwriting
    val e2 = intercept[IllegalArgumentException](graft.ops.Joins.s2RadiusJoin(
      left.withColumn("meters", left("lid")), right,
      "lon1", "lat1", "lon2", "lat2", 30000.0, 7))
    assert(e2.getMessage.contains("rename"))
    // fractional radius: the filter runs on the UNROUNDED distance —
    // radius 30000.4 must keep everything radius 30000.0 keeps (a
    // rounded filter would compare 30001 <= 30000.4 and drop pairs)
    val frac = graft.ops.Joins
      .s2RadiusJoin(left, right, "lon1", "lat1", "lon2", "lat2", 30000.4, 7)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(blocked.toSet.subsetOf(frac))
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

    // rect/cap algebra through codegen, incl. the NULL empty rect
    val alg = Seq(1).toDF("one")
      .selectExpr(
        "s2_rect_add(geo_to_s2(5.0D, 45.0D), geo_to_s2(15.0D, 55.0D), geo_to_s2(20.0D, 60.0D)).hi AS ahi",
        "s2_rect_union(geo_to_s2(5.0D, 45.0D), geo_to_s2(15.0D, 55.0D), geo_to_s2(10.0D, 50.0D), geo_to_s2(25.0D, 60.0D)).lo AS ulo",
        "s2_rect_intersection(geo_to_s2(5.0D, 45.0D), geo_to_s2(15.0D, 55.0D), geo_to_s2(30.0D, 50.0D), geo_to_s2(40.0D, 55.0D)) IS NULL AS empty",
        "s2_cap_union(geo_to_s2(10.0D, 50.0D), 60.0D, geo_to_s2(20.0D, 52.0D), 1.0D).radius AS ur",
        "h3_num_hexagons(0) AS n0",
        "h3_num_hexagons(15) AS n15")
      .as[(Long, Long, Boolean, Double, Long, Long)].head()
    assert(math.abs(S2Math.s2ToGeo(alg._1)._1 - 20.0) < 1e-5)
    assert(math.abs(S2Math.s2ToGeo(alg._2)._1 - 5.0) < 1e-5)
    assert(alg._3 && alg._4 == 60.0)
    assert(alg._5 == 122L && alg._6 == 569707381193162L)
  }
}
