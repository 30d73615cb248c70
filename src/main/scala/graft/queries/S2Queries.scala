package graft.queries

import graft.{QDef, Tables}
import graft.functions.GraftFunctions
import graft.ops.Joins
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S2 cell geometry + H3 index algebra gate entries (SURVEY §2.8
  * #121). All three are HASH-CHECKED: the s2 oracles are faithful
  * DuckDB transcriptions of the projection + Hilbert walk
  * (`S2Sql.scala` — see its header for the cross-engine trig
  * exactness argument and why the gate compares level-12 cells), the
  * h3 oracle is pure published-layout bit arithmetic. The lattice
  * sits on 0.05° offsets so no fixture point lands on a face-diagonal
  * tie (|tan lon| = 1, tan lat = cos lon) where the cube-face choice
  * would compare two trig values equal to the last ulp.
  */
object S2Queries {

  /** Pseudo-coordinate lattice shared by the s2 entries — identical
    * text on both engines; every input double is bit-identical across
    * engines (integer arithmetic, one /10.0, one subtract).
    */
  private val latticeSql =
    """SELECT c_custkey,
              CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat,
              CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon
       FROM customer WHERE c_custkey % 10 = 0"""

  private def pts(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .filter(col("c_custkey") % 10 === 0)
      .selectExpr("c_custkey",
        "CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat",
        "CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon")

  /** Constructed valid h3 index (res 15): mode 1, base cell from the
    * key, first digit in 2–6 (never violates the pentagon deleted-K
    * rule), remaining digits (c·k) mod 7. Shared text on both engines
    * — pure integer arithmetic.
    */
  private val h3Construct: String = {
    val digitTerms = (1 to 15).map { k =>
      val w = BigInt(8).pow(15 - k)
      val d = if (k == 1) "(2 + c_custkey % 5)" else s"((c_custkey * $k) % 7)"
      s"$d * $w"
    }.mkString(" + ")
    s"(576460752303423488 + ${15L * 4503599627370496L} + " +
      s"(c_custkey % 122) * 35184372088832 + $digitTerms)"
  }

  val defs: Seq[QDef] = Seq(

    // geoToS2 → level-12 rollup + s2ToGeo round-trip + cross-level
    // intersection. The oracle re-derives the cell from scratch:
    // trig → cube face → quadratic ST → recursive-CTE Hilbert walk.
    QDef("scalar_geo_s2", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      pts(s, dir).selectExpr("c_custkey",
          "s2_parent(geo_to_s2(lon, lat), 12) AS cell12",
          "s2_level(s2_parent(geo_to_s2(lon, lat), 12)) AS lvl",
          "round(s2_to_geo(geo_to_s2(lon, lat)).lon, 4) AS rt_lon",
          "round(s2_to_geo(geo_to_s2(lon, lat)).lat, 4) AS rt_lat",
          // level-12 cell of the point vs level-8 cell of its mirror
          // across the equator: intersects exactly when the mirror's
          // level-8 cell is an ancestor (true near the equator)
          "s2_cells_intersect(s2_parent(geo_to_s2(lon, lat), 12), " +
            "s2_parent(geo_to_s2(lon, 0.0 - lat), 8)) AS isx")
        .orderBy($"c_custkey")
    }, Some {
      val proj = S2Sql.projCtes("a", "tag", Seq("c_custkey", "tg"), 12)
      val walk = S2Sql.walkCtes("w", "a_ij", Seq("c_custkey", "tg"), 12)
      val id12 = S2Sql.idAt("face", "pos", 12, 12)
      val id8 = S2Sql.idAt("face", "pos", 12, 8)
      s"""
      WITH RECURSIVE pts AS ($latticeSql),
      tag AS (
        SELECT c_custkey, 0 AS tg, lon, lat FROM pts
        UNION ALL
        SELECT c_custkey, 1 AS tg, lon, 0.0 - lat FROM pts),
      $proj,
      $walk,
      cells AS (
        SELECT c_custkey, tg, $id12 AS id12, $id8 AS id8 FROM w_pos),
      m AS (
        SELECT a.c_custkey, a.id12 AS ca12, b.id8 AS cb8
        FROM cells a JOIN cells b
          ON a.c_custkey = b.c_custkey AND a.tg = 0 AND b.tg = 1)
      SELECT p.c_custkey,
             ${SipHashSql.signed("m.ca12")} AS cell12,
             CAST(12 AS INTEGER) AS lvl,
             round(p.lon, 4) AS rt_lon,
             round(p.lat, 4) AS rt_lat,
             (${S2Sql.rangeMin("m.ca12", 12)} <= ${S2Sql.rangeMax("m.cb8", 8)}
              AND ${S2Sql.rangeMin("m.cb8", 8)} <= ${S2Sql.rangeMax("m.ca12", 12)}) AS isx
      FROM m JOIN pts p ON m.c_custkey = p.c_custkey
      ORDER BY p.c_custkey"""
    }),

    // s2GetNeighbors at level 12 for face-interior cells (the oracle
    // walks the four ±1 grid offsets; seam/corner wrap is pinned by
    // S2Spec's adjacency properties instead — transcribing the
    // linear-uv wrap adds nothing the interior walk doesn't prove).
    QDef("scalar_geo_s2_neighbors", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val interior = "fij.i BETWEEN 1 AND 4094 AND fij.j BETWEEN 1 AND 4094"
      pts(s, dir)
        .selectExpr("c_custkey",
          "s2_parent(geo_to_s2(lon, lat), 12) AS cell",
          "s2_face_ij(s2_parent(geo_to_s2(lon, lat), 12)) AS fij")
        .selectExpr("c_custkey", "cell", "fij.face AS face",
          s"CASE WHEN $interior THEN element_at(s2_get_neighbors(cell), 1) END AS n_down",
          s"CASE WHEN $interior THEN element_at(s2_get_neighbors(cell), 2) END AS n_right",
          s"CASE WHEN $interior THEN element_at(s2_get_neighbors(cell), 3) END AS n_up",
          s"CASE WHEN $interior THEN element_at(s2_get_neighbors(cell), 4) END AS n_left")
        .orderBy($"c_custkey")
    }, Some {
      val proj = S2Sql.projCtes("a", "pts", Seq("c_custkey"), 12)
      val walk = S2Sql.walkCtes("w", "cand", Seq("c_custkey", "tg"), 12)
      val id12 = S2Sql.idAt("face", "pos", 12, 12)
      def pick(tg: Int) = SipHashSql.signed(s"max(CASE WHEN tg = $tg THEN $id12 END)")
      s"""
      WITH RECURSIVE pts AS ($latticeSql),
      $proj,
      cand AS (
        SELECT c_custkey, 0 AS tg, face, i, j FROM a_ij
        UNION ALL SELECT c_custkey, 1, face, i, j - 1 FROM a_ij
          WHERE i BETWEEN 1 AND 4094 AND j BETWEEN 1 AND 4094
        UNION ALL SELECT c_custkey, 2, face, i + 1, j FROM a_ij
          WHERE i BETWEEN 1 AND 4094 AND j BETWEEN 1 AND 4094
        UNION ALL SELECT c_custkey, 3, face, i, j + 1 FROM a_ij
          WHERE i BETWEEN 1 AND 4094 AND j BETWEEN 1 AND 4094
        UNION ALL SELECT c_custkey, 4, face, i - 1, j FROM a_ij
          WHERE i BETWEEN 1 AND 4094 AND j BETWEEN 1 AND 4094),
      $walk,
      agg AS (
        SELECT c_custkey,
               ${pick(0)} AS cell, ${pick(1)} AS n_down, ${pick(2)} AS n_right,
               ${pick(3)} AS n_up, ${pick(4)} AS n_left
        FROM w_pos GROUP BY c_custkey)
      SELECT g.c_custkey, g.cell, CAST(x.face AS INTEGER) AS face,
             g.n_down, g.n_right, g.n_up, g.n_left
      FROM agg g JOIN a_ij x ON g.c_custkey = x.c_custkey
      ORDER BY g.c_custkey"""
    }),

    // S2 cell-blocked radius join (ops/Joins.s2RadiusJoin): candidates
    // via level-5 cell equi-join over the 3×3 neighborhood, exact
    // haversine on candidates only. The ORACLE is the NAIVE quadratic
    // join — the hash gate literally proves the blocking is lossless
    // on the fixture (S2Spec proves it again on seam/pole clusters
    // where a lat/lon degree grid would miss pairs).
    QDef("join_geo_s2_block", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val cust = Tables(s, dir, "customer")
        .filter($"c_custkey" % 10 === 0)
        .selectExpr("c_custkey", "c_nationkey",
          "CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat1",
          "CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon1")
      val supp = Tables(s, dir, "supplier")
        .selectExpr("s_suppkey",
          "CAST((s_suppkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat2",
          "CAST((s_suppkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon2")
      Joins.s2RadiusJoin(cust, supp, "lon1", "lat1", "lon2", "lat2",
          radiusMeters = 100000.0, level = 5)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("pairs"), min($"meters").as("min_m"))
        .orderBy($"c_nationkey")
    }, Some("""
      WITH c AS (SELECT c_custkey, c_nationkey,
                        CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat1,
                        CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon1
                 FROM customer WHERE c_custkey % 10 = 0),
      s AS (SELECT s_suppkey,
                   CAST((s_suppkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat2,
                   CAST((s_suppkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon2
            FROM supplier),
      p AS (SELECT c_nationkey,
                   2 * 6371000 * asin(sqrt(
                     pow(sin(radians(lat2 - lat1) / 2), 2) +
                     cos(radians(lat1)) * cos(radians(lat2)) *
                     pow(sin(radians(lon2 - lon1) / 2), 2))) AS raw_m
            FROM c, s)
      SELECT c_nationkey, count(*) AS pairs,
             min(CAST(round(raw_m, 0) AS BIGINT)) AS min_m
      FROM p WHERE raw_m <= 100000.0 GROUP BY c_nationkey
      ORDER BY c_nationkey""")),

    // The SAME radius join through the r17 H3 blocking
    // (Joins.h3RadiusJoin: res-1 hexagon cells from the native
    // H3Proj projection, 2-RING explode — one ring is NOT enough:
    // pentagons squeeze distance-2 cells to ~0.15 average edge
    // lengths apart, see the operator's scaladoc). Identical input,
    // radius and aggregation as join_geo_s2_block, and the SAME naive
    // quadratic oracle: the gate proves h3 blocking lossless AND, by
    // transitivity, that the s2 and h3 paths agree pair-for-pair.
    QDef("join_geo_h3_block", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      val cust = Tables(s, dir, "customer")
        .filter($"c_custkey" % 10 === 0)
        .selectExpr("c_custkey", "c_nationkey",
          "CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat1",
          "CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon1")
      val supp = Tables(s, dir, "supplier")
        .selectExpr("s_suppkey",
          "CAST((s_suppkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat2",
          "CAST((s_suppkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon2")
      Joins.h3RadiusJoin(cust, supp, "lon1", "lat1", "lon2", "lat2",
          radiusMeters = 100000.0, res = 1)
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("pairs"), min($"meters").as("min_m"))
        .orderBy($"c_nationkey")
    }, Some("""
      WITH c AS (SELECT c_custkey, c_nationkey,
                        CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat1,
                        CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon1
                 FROM customer WHERE c_custkey % 10 = 0),
      s AS (SELECT s_suppkey,
                   CAST((s_suppkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat2,
                   CAST((s_suppkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon2
            FROM supplier),
      p AS (SELECT c_nationkey,
                   2 * 6371000 * asin(sqrt(
                     pow(sin(radians(lat2 - lat1) / 2), 2) +
                     cos(radians(lat1)) * cos(radians(lat2)) *
                     pow(sin(radians(lon2 - lon1) / 2), 2))) AS raw_m
            FROM c, s)
      SELECT c_nationkey, count(*) AS pairs,
             min(CAST(round(raw_m, 0) AS BIGINT)) AS min_m
      FROM p WHERE raw_m <= 100000.0 GROUP BY c_nationkey
      ORDER BY c_nationkey""")),

    // H3 index algebra over constructed valid indexes: parent rollup,
    // field extraction, per-row validity (a corrupted digit goes
    // invalid exactly when it lands in a USED slot), pentagon /
    // class-III flags, children fan-out (pentagon deleted-K count),
    // hex codec round-trip. Oracle = published-layout bit arithmetic.
    // geoToH3 itself on the hash gate (r17): the DuckDB oracle
    // re-derives every cell from scratch — face argmin + gnomonic
    // hex2d + the published hex rounding + the aperture-7 digit loop
    // as a recursive CTE + the base-cell/rotation lookups inlined as
    // literals (H3Sql.scala; exactness argument in its header). Two
    // resolutions cover both the class-II and class-III paths.
    QDef("scalar_h3_geo", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables(s, dir, "customer").filter($"c_custkey" % 7 === 0)
        .selectExpr("c_custkey",
          "CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat",
          "CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon")
        .selectExpr("c_custkey",
          "geo_to_h3(lon, lat, 7) AS h7",
          "geo_to_h3(lon, lat, 4) AS h4")
        .orderBy("c_custkey")
    }, Some(H3Sql.geoToH3Sql(
      """SELECT c_custkey,
                CAST((c_custkey % 1700) / 10.0 - 84.95 AS DOUBLE) AS lat,
                CAST((c_custkey % 3500) / 10.0 - 174.95 AS DOUBLE) AS lon
         FROM customer WHERE c_custkey % 7 = 0""",
      "c_custkey", Seq(7, 4)) + " ORDER BY c_custkey")),

    QDef("scalar_h3_bits", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables(s, dir, "customer")
        .filter($"c_custkey" % 10 === 0)
        .selectExpr("c_custkey",
          s"$h3Construct AS h15",
          "CAST(c_custkey % 16 AS INT) AS r")
        .selectExpr("c_custkey",
          "h3_to_parent(h15, r) AS cp",
          "h3_get_resolution(h3_to_parent(h15, r)) AS res",
          "h3_get_base_cell(h3_to_parent(h15, r)) AS base",
          // corrupt digit 3 (bits 36–38) on every third row: invalid
          // iff digit 3 is a used slot (r >= 3); in the trailing
          // region the OR is a no-op on the required 7
          "CASE WHEN c_custkey % 3 = 0 THEN h3_is_valid(h3_to_parent(h15, r) | 481036337152) " +
            "ELSE h3_is_valid(h3_to_parent(h15, r)) END AS vmix",
          "h3_is_pentagon(h3_to_parent(h15, 0)) AS pent",
          "h3_is_res_class_iii(h3_to_parent(h15, r)) AS c3",
          "h3_to_string(h3_to_parent(h15, r)) AS hstr",
          "string_to_h3(h3_to_string(h3_to_parent(h15, r))) AS rt",
          "h3_to_center_child(h3_to_parent(h15, 0), 2) AS ccid",
          "size(h3_to_children(h3_to_parent(h15, 0), 2)) AS nkids")
        .orderBy($"c_custkey")
    }, Some(s"""
      WITH src AS (
        SELECT c_custkey, $h3Construct AS h15, c_custkey % 16 AS r
        FROM customer WHERE c_custkey % 10 = 0),
      p AS (
        SELECT c_custkey, r,
               ((h15 - ${15L * 4503599627370496L} + r * 4503599627370496)
                 | ((1::BIGINT << (3 * (15 - CAST(r AS INTEGER)))) - 1)) AS cp,
               (c_custkey % 122) IN (4,14,24,38,49,58,63,72,83,97,107,117) AS is_pent,
               (c_custkey % 122) AS b
        FROM src)
      SELECT c_custkey, cp,
             CAST(r AS INTEGER) AS res,
             CAST(b AS INTEGER) AS base,
             CASE WHEN c_custkey % 3 = 0 THEN r < 3 ELSE TRUE END AS vmix,
             is_pent AS pent,
             r % 2 = 1 AS c3,
             printf('%x', cp) AS hstr,
             cp AS rt,
             (576460752303423488 + ${2L * 4503599627370496L}
               + b * 35184372088832 + ${(1L << 39) - 1}) AS ccid,
             CAST(CASE WHEN is_pent THEN 41 ELSE 49 END AS INTEGER) AS nkids
      FROM p ORDER BY c_custkey"""))
  )
}
