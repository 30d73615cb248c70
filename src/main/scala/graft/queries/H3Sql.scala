package graft.queries

import graft.functions.H3Proj
import graft.ops.Vectors.duckDouble

/** DuckDB transcription of geoToH3 (functions/H3Proj.scala): face
  * pick + gnomonic hex2d as plain double arithmetic, the published
  * hex-grid rounding as a CASE cascade, the aperture-7 digit loop as
  * a recursive CTE over integer ijk algebra, and the base-cell /
  * rotation lookups from the (published, here re-derived and
  * spec-pinned) tables inlined as literals — the same pattern as the
  * S2 Hilbert and SipHash transcriptions.
  *
  * Cross-engine exactness: the two engines' trig may differ in the
  * last ulp, so the planar hex coordinates agree only to ~1e-15
  * relative. Three places could amplify that into a different cell:
  *  - the FACE pick (argmin over 20 centers) — harmless by design:
  *    the rotation table makes the result face-independent for any
  *    face whose res-0 coordinates stay in range, which is exactly
  *    the nearest-face contenders;
  *  - the hex rounding case boundaries — cell centers land EXACTLY on
  *    them, so both engines snap near-integral lattice coordinates
  *    (1e-9 relative) the same way; a generic fixture point sits
  *    ~half a cell away, and the probability of one inside the
  *    residual 1e-15 window is negligible (S2Sql's level-12 ulp
  *    argument, here at res ≤ 7);
  *  - `round((3i-j)/7)` half-way ties — impossible: n/7 = m + 1/2 has
  *    no integer solution, and the value is ≥ 1/14 from the boundary.
  * The leaf-level bit pattern is pinned instead by H3ProjSpec's
  * published vectors (incl. the CH Moscow res-15 value, bit-exact).
  */
object H3Sql {

  private val ccwDigit = Array(0, 5, 3, 1, 6, 4, 2)
  private val cwDigit = Array(0, 3, 6, 2, 5, 1, 4)

  private def lst(a: Seq[Int]): String = a.mkString("[", ",", "]")

  /** ccw^k digit permutation as a DuckDB 1-indexed literal lookup. */
  private def ccwPow(k: Int): Array[Int] = {
    var t = Array.tabulate(7)(identity)
    (0 until k).foreach(_ => t = t.map(ccwDigit))
    t
  }

  /** Four nested layers normalizing integer (<in>i/<in>j/<in>k) into
    * (<out>i/<out>j/<out>k) — the published _ijkNormalize (zero the
    * negative axes in i, j, k order, then subtract the min).
    */
  private def normLayers(in: String, o: String): Seq[String] = Seq(
    s"""SELECT *,
         CASE WHEN ${in}i < 0 THEN 0 ELSE ${in}i END AS ${o}ai,
         CASE WHEN ${in}i < 0 THEN ${in}j - ${in}i ELSE ${in}j END AS ${o}aj,
         CASE WHEN ${in}i < 0 THEN ${in}k - ${in}i ELSE ${in}k END AS ${o}ak FROM""",
    s"""SELECT *,
         CASE WHEN ${o}aj < 0 THEN ${o}ai - ${o}aj ELSE ${o}ai END AS ${o}bi,
         CASE WHEN ${o}aj < 0 THEN 0 ELSE ${o}aj END AS ${o}bj,
         CASE WHEN ${o}aj < 0 THEN ${o}ak - ${o}aj ELSE ${o}ak END AS ${o}bk FROM""",
    s"""SELECT *,
         CASE WHEN ${o}bk < 0 THEN ${o}bi - ${o}bk ELSE ${o}bi END AS ${o}ci,
         CASE WHEN ${o}bk < 0 THEN ${o}bj - ${o}bk ELSE ${o}bj END AS ${o}cj,
         CASE WHEN ${o}bk < 0 THEN 0 ELSE ${o}bk END AS ${o}ck FROM""",
    s"""SELECT *,
         ${o}ci - least(${o}ci, ${o}cj, ${o}ck) AS ${o}i,
         ${o}cj - least(${o}ci, ${o}cj, ${o}ck) AS ${o}j,
         ${o}ck - least(${o}ci, ${o}cj, ${o}ck) AS ${o}k FROM""")

  private def nest(inner: String, layers: Seq[String]): String =
    layers.foldLeft(inner)((acc, l) => s"$l ($acc)")

  /** The complete oracle SQL: `src` must provide (key, lat, lon);
    * emits one row per key with geoToH3 at each of `resolutions`
    * pivoted into columns h<res>.
    */
  def geoToH3Sql(src: String, key: String, resolutions: Seq[Int]): String = {
    require(resolutions.nonEmpty && resolutions.forall(r => r >= 0 && r <= 15))
    val faces = H3Proj.faceRows.zipWithIndex.map { case ((la, lo, az), f) =>
      s"($f, ${duckDouble(la)}, ${duckDouble(lo)}, ${duckDouble(az)})"
    }.mkString(", ")
    val (bcs, rots) = H3Proj.lookupFlat
    val pents = H3Proj.baseCellRows.zipWithIndex.collect {
      case (d, b) if d._5 => b
    }
    val cwo1 = H3Proj.baseCellRows.map(_._6)
    val cwo2 = H3Proj.baseCellRows.map(_._7)
    val resUnion = resolutions
      .map(r => s"SELECT $key, lat, lon, $r AS res FROM __pts")
      .mkString(" UNION ALL ")
    // √7 multiplication chain per res (Scala multiplies sequentially)
    def s7chain(r: Int): String =
      "tan(r0) / 0.38196601125010500003" + " * sqrt(7.0)" * r
    val rrExpr = resolutions.map(r => s"WHEN res = $r THEN ${s7chain(r)}")
      .mkString("CASE ", " ", " ELSE NULL END")
    val snap = (v: String) =>
      s"""(CASE WHEN abs(($v) - round($v)) < 1e-9 * greatest(1.0, abs($v))
            THEN round($v) ELSE ($v) END)"""
    val posAng = (a: String) => s"(($a) - 2*pi()*floor(($a)/(2*pi())))"

    // ---- recursive digit-extraction arm ----
    val t0 = s"""
      SELECT $key, res, face, r, i AS li, j AS lj, k AS lk, digits,
             CASE WHEN r % 2 = 1
                  THEN CAST(round((3*(i - k) - (j - k)) / 7.0) AS BIGINT)
                  ELSE CAST(round((2*(i - k) + (j - k)) / 7.0) AS BIGINT)
             END AS u0i,
             CASE WHEN r % 2 = 1
                  THEN CAST(round(((i - k) + 2*(j - k)) / 7.0) AS BIGINT)
                  ELSE CAST(round((3*(j - k) - (i - k)) / 7.0) AS BIGINT)
             END AS u0j,
             CAST(0 AS BIGINT) AS u0k
      FROM __loop WHERE r > 0"""
    val upNorm = normLayers("u0", "u")
    val centerRaw = s"""
      SELECT *,
        CASE WHEN r % 2 = 1 THEN 3*ui + uj ELSE 3*ui + uk END AS c0i,
        CASE WHEN r % 2 = 1 THEN 3*uj + uk ELSE ui + 3*uj END AS c0j,
        CASE WHEN r % 2 = 1 THEN ui + 3*uk ELSE uj + 3*uk END AS c0k FROM"""
    val cNorm = normLayers("c0", "c")
    val diffRaw =
      "SELECT *, li - ci AS d0i, lj - cj AS d0j, lk - ck AS d0k FROM"
    val dNorm = normLayers("d0", "d")
    val digitLayer = s"""
      SELECT *, CASE di*100 + dj*10 + dk
                  WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 10 THEN 2 WHEN 11 THEN 3
                  WHEN 100 THEN 4 WHEN 101 THEN 5 WHEN 110 THEN 6
                  ELSE NULL END AS dg FROM"""
    val arm = s"""
      SELECT $key, res, face, r - 1 AS r, ui AS i, uj AS j, uk AS k,
             list_prepend(dg, digits) AS digits
      FROM (${nest(s"($t0)",
        upNorm ++ Seq(centerRaw) ++ cNorm ++ Seq(diffRaw) ++ dNorm ++
          Seq(digitLayer))}) __arm"""

    // ---- pentagon rotation chain p1..p4 over column d0 ----
    val ccw1 = lst(ccwPow(1))
    def pentLayer(prev: String, cur: Int): Seq[String] = Seq(
      s"SELECT *, list_transform($prev, v -> ($ccw1)[v + 1]) AS e$cur FROM",
      s"""SELECT *, CASE WHEN coalesce(list_filter(e$cur, v -> v != 0)[1], 0) = 1
             THEN list_transform(e$cur, v -> ($ccw1)[v + 1]) ELSE e$cur
           END AS p$cur FROM""")
    val pentChain =
      pentLayer("d0", 1) ++ pentLayer("p1", 2) ++ pentLayer("p2", 3) ++
        pentLayer("p3", 4)
    val hexCase = (1 to 5)
      .map(k => s"WHEN nr = $k THEN list_transform(digits, v -> (${lst(ccwPow(k))})[v + 1])")
      .mkString(" ")

    s"""
    WITH RECURSIVE __pts AS (SELECT * FROM ($src) __s),
    __faces(face, fla, flo, az0) AS (VALUES $faces),
    __both AS ($resUnion),
    __fp AS (
      SELECT $key, res, lat, lon, face, fla, flo, az0, sqd
      FROM (
        SELECT *, row_number() OVER (PARTITION BY $key, res
                                     ORDER BY sqd, face) AS rn
        FROM (
          SELECT b.*, f.face, f.fla, f.flo, f.az0,
                 (cos(f.fla)*cos(f.flo) - cos(radians(b.lat))*cos(radians(b.lon)))
                   * (cos(f.fla)*cos(f.flo) - cos(radians(b.lat))*cos(radians(b.lon)))
               + (cos(f.fla)*sin(f.flo) - cos(radians(b.lat))*sin(radians(b.lon)))
                   * (cos(f.fla)*sin(f.flo) - cos(radians(b.lat))*sin(radians(b.lon)))
               + (sin(f.fla) - sin(radians(b.lat)))
                   * (sin(f.fla) - sin(radians(b.lat))) AS sqd
          FROM __both b CROSS JOIN __faces f) __d) __r
      WHERE rn = 1),
    __xy AS (
      SELECT $key, res, face,
             CASE WHEN r0 < 1e-14 THEN 0.0 ELSE rr * cos(theta) END AS x,
             CASE WHEN r0 < 1e-14 THEN 0.0 ELSE rr * sin(theta) END AS y
      FROM (
        SELECT *, $rrExpr AS rr
        FROM (
          SELECT *, CASE WHEN res % 2 = 1
                         THEN ${posAng("theta0 - asin(sqrt(3.0/28.0))")}
                         ELSE theta0 END AS theta
          FROM (
            SELECT *, ${posAng(s"az0 - ${posAng(
              """atan2(cos(radians(lat)) * sin(radians(lon) - flo),
                       cos(fla) * sin(radians(lat)) -
                       sin(fla) * cos(radians(lat)) * cos(radians(lon) - flo))""")}")} AS theta0,
                   acos(greatest(-1.0, least(1.0, 1.0 - sqd / 2.0))) AS r0
            FROM __fp) __t0) __t1) __t2),
    __ijk AS (
      SELECT $key, res, face,
             CASE WHEN x < 0 THEN
               CASE WHEN pj % 2 = 0 THEN pi - 2*(pi - pj // 2)
                    ELSE pi - (2*(pi - (pj + 1) // 2) + 1) END
             ELSE pi END
             - CASE WHEN y < 0 THEN (2*pj + 1) // 2 ELSE 0 END AS n0i,
             CASE WHEN y < 0 THEN -pj ELSE pj END AS n0j,
             CAST(0 AS BIGINT) AS n0k
      FROM (
        -- nearest of the four surrounding lattice centers in the
        -- sheared hex metric, first strict minimum in fixed order —
        -- operation-for-operation the H3Proj.hex2dToIjk argmin
        SELECT *,
          m1 + CASE WHEN sel = 1 OR sel = 3 THEN 1 ELSE 0 END AS pi,
          m2 + CASE WHEN sel = 2 OR sel = 3 THEN 1 ELSE 0 END AS pj
        FROM (
          SELECT *,
            CASE WHEN d00 <= d10 AND d00 <= d01 AND d00 <= d11 THEN 0
                 WHEN d10 <= d01 AND d10 <= d11 THEN 1
                 WHEN d01 <= d11 THEN 2
                 ELSE 3 END AS sel
          FROM (
            SELECT *,
              ((r1 - 0) - (r2 - 0)/2.0)*((r1 - 0) - (r2 - 0)/2.0)
                + 0.75*((r2 - 0)*(r2 - 0)) AS d00,
              ((r1 - 1) - (r2 - 0)/2.0)*((r1 - 1) - (r2 - 0)/2.0)
                + 0.75*((r2 - 0)*(r2 - 0)) AS d10,
              ((r1 - 0) - (r2 - 1)/2.0)*((r1 - 0) - (r2 - 1)/2.0)
                + 0.75*((r2 - 1)*(r2 - 1)) AS d01,
              ((r1 - 1) - (r2 - 1)/2.0)*((r1 - 1) - (r2 - 1)/2.0)
                + 0.75*((r2 - 1)*(r2 - 1)) AS d11
            FROM (
          SELECT *, x1 - m1 AS r1, x2 - m2 AS r2
          FROM (
            SELECT *, CAST(floor(x1) AS BIGINT) AS m1,
                      CAST(floor(x2) AS BIGINT) AS m2
            FROM (
              SELECT *, ${snap("abs(x) + x2 / 2.0")} AS x1
              FROM (
                SELECT *, ${snap("abs(y) / (sqrt(3.0) / 2.0)")} AS x2
                FROM __xy) __a) __b) __c) __d) __d2) __d3) __e),
    __loop AS (
      SELECT $key, res, face, res AS r, ni AS i, nj AS j, nk AS k,
             []::BIGINT[] AS digits
      FROM (${nest("SELECT * FROM __ijk", normLayers("n0", "n"))}) __n
      UNION ALL
      $arm),
    __base AS (
      SELECT $key, res, face, i, j, k, digits FROM __loop WHERE r = 0),
    __look AS (
      SELECT $key, res, digits,
             CASE WHEN i <= 2 AND j <= 2 AND k <= 2
                  THEN (${lst(bcs.toSeq)})[face*27 + i*9 + j*3 + k + 1]
                  ELSE NULL END AS bc,
             CASE WHEN i <= 2 AND j <= 2 AND k <= 2
                  THEN (${lst(rots.toSeq)})[face*27 + i*9 + j*3 + k + 1]
                  ELSE NULL END AS nr,
             face
      FROM __base),
    __pre AS (
      SELECT $key, res, bc, nr,
             bc IN (${pents.mkString(",")}) AS pent, digits,
             CASE WHEN bc IN (${pents.mkString(",")})
                    AND coalesce(list_filter(digits, v -> v != 0)[1], 0) = 1
                  THEN CASE WHEN (${lst(cwo1.toSeq)})[bc + 1] = face
                              OR (${lst(cwo2.toSeq)})[bc + 1] = face
                            THEN list_transform(digits, v -> (${lst(cwDigit.toSeq)})[v + 1])
                            ELSE list_transform(digits, v -> ($ccw1)[v + 1]) END
                  ELSE digits END AS d0
      FROM __look),
    __rot AS (
      SELECT $key, res, bc,
             CASE WHEN pent THEN
               CASE WHEN nr = 0 THEN d0 WHEN nr = 1 THEN p1
                    WHEN nr = 2 THEN p2 WHEN nr = 3 THEN p3
                    WHEN nr = 4 THEN p4 ELSE NULL END
             ELSE
               CASE WHEN nr = 0 THEN digits $hexCase ELSE NULL END
             END AS fd
      FROM (${nest("SELECT * FROM __pre", pentChain)}) __p),
    __h AS (
      SELECT $key, res,
             CAST((CAST(1 AS BIGINT) << 59)
               + (CAST(res AS BIGINT) << 52)
               + (CAST(bc AS BIGINT) << 45)
               + list_sum(list_transform(range(1, 16), i ->
                   CAST(CASE WHEN i <= res THEN fd[CAST(i AS INT)] ELSE 7 END AS BIGINT)
                     * (CAST(1 AS BIGINT) << CAST(3 * (15 - i) AS INT))))
               AS BIGINT) AS h
      FROM __rot)
    SELECT $key,
           ${resolutions.map(r =>
             s"max(CASE WHEN res = $r THEN h END) AS h$r").mkString(",\n           ")}
    FROM __h GROUP BY $key"""
  }
}
