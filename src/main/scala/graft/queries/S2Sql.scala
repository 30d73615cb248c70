package graft.queries

/** DuckDB transcription of geoToS2 (functions/S2.scala) at a fixed
  * target level: the cube-face selection, gnomonic projection and
  * quadratic ST as plain double arithmetic, and the face-seeded
  * Hilbert walk as a recursive CTE (one step per level — the same
  * pattern as the geohash and SipHash transcriptions).
  *
  * Cross-engine exactness note (why the gate checks a LEVEL-12 cell,
  * not the leaf): the two engines' cos/sin/atan2 may legitimately
  * differ in the last ulp, so s/t agree only to ~1e-15 relative. A
  * level-L grid has 2^L floor boundaries per axis; the probability
  * that any fixture point lands within 1e-15 of one is ~2^L · 2e-15
  * per value — at level 12 that is ~1e-11 per value (~1e-7 per gate
  * run over the sf0.01 fixture), at leaf level 30 it would be ~1%.
  * The declared lattice also keeps 0.05° away from the face-diagonal
  * ties (|tan lon| = 1 etc.) where the FACE choice itself would sit
  * on an ulp boundary. The leaf-level bit pattern is pinned instead
  * by S2Spec's published vectors.
  */
object S2Sql {

  /** Hilbert child position from orientation (0–3) and interleaved ij
    * bits (2·i_bit + j_bit) — the ijToPos table as one CASE.
    */
  private def pv(orient: String, ijb: String): String =
    s"""CASE ($orient) * 4 + ($ijb)
          WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 2
          WHEN 4 THEN 0 WHEN 5 THEN 3 WHEN 6 THEN 1 WHEN 7 THEN 2
          WHEN 8 THEN 2 WHEN 9 THEN 3 WHEN 10 THEN 1 WHEN 11 THEN 0
          WHEN 12 THEN 2 WHEN 13 THEN 1 WHEN 14 THEN 3 ELSE 0 END"""

  /** CTE chain `<p>_xyz, <p>_f, <p>_uv, <p>_st, <p>_ij` projecting a
    * relation `src(keyCols…, lon, lat)` onto level-`level` grid
    * coordinates (face, i, j). Mirrors S2Math.{face,faceUV,uvToST,
    * stToIJ}; floor(s·2^L) equals the leaf floor's top L bits because
    * scaling by a power of two is exact in IEEE doubles.
    */
  def projCtes(p: String, src: String, keyCols: Seq[String], level: Int): String = {
    val keys = keyCols.mkString(", ")
    val n = 1 << level
    s"""
    ${p}_xyz AS (
      SELECT $keys,
             cos(radians(lat)) * cos(radians(lon)) AS x,
             cos(radians(lat)) * sin(radians(lon)) AS y,
             sin(radians(lat)) AS z
      FROM $src),
    ${p}_f AS (
      SELECT $keys, x, y, z,
             (CASE WHEN abs(x) > abs(y)
                   THEN (CASE WHEN abs(x) > abs(z) THEN 0 ELSE 2 END)
                   ELSE (CASE WHEN abs(y) > abs(z) THEN 1 ELSE 2 END) END)
             + (CASE WHEN (CASE WHEN abs(x) > abs(y)
                                THEN (CASE WHEN abs(x) > abs(z) THEN x ELSE z END)
                                ELSE (CASE WHEN abs(y) > abs(z) THEN y ELSE z END) END) < 0
                     THEN 3 ELSE 0 END) AS face
      FROM ${p}_xyz),
    ${p}_uv AS (
      SELECT $keys, face,
             CASE face WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
                       WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
             CASE face WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
                       WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE -x/z END AS v
      FROM ${p}_f),
    ${p}_st AS (
      SELECT $keys, face,
             CASE WHEN u >= 0 THEN 0.5 * sqrt(1 + 3*u)
                  ELSE 1 - 0.5 * sqrt(1 - 3*u) END AS s,
             CASE WHEN v >= 0 THEN 0.5 * sqrt(1 + 3*v)
                  ELSE 1 - 0.5 * sqrt(1 - 3*v) END AS t
      FROM ${p}_uv),
    ${p}_ij AS (
      SELECT $keys, face,
             CAST(LEAST(${n - 1}, GREATEST(0, FLOOR(s * $n))) AS BIGINT) AS i,
             CAST(LEAST(${n - 1}, GREATEST(0, FLOOR(t * $n))) AS BIGINT) AS j
      FROM ${p}_st)"""
  }

  /** Recursive-CTE Hilbert walk `<p>_w` + fixpoint view `<p>_pos` over
    * a relation `src(keyCols…, face, i, j)` at `level` (orientation
    * seeded with the face's swap bit; tables as in [[pv]]).
    */
  def walkCtes(p: String, src: String, keyCols: Seq[String], level: Int): String = {
    val keys = keyCols.mkString(", ")
    val ijb = s"((i >> (${level - 1} - k)) & 1) * 2 + ((j >> (${level - 1} - k)) & 1)"
    val pvE = pv("orient", ijb)
    s"""
    ${p}_w AS (
      SELECT $keys, face, i, j, 0 AS k,
             CAST(face % 2 AS BIGINT) AS orient, CAST(0 AS HUGEINT) AS pos
      FROM $src
      UNION ALL
      SELECT $keys, face, i, j, k + 1,
             xor(orient, CASE $pvE WHEN 0 THEN 1 WHEN 3 THEN 3 ELSE 0 END),
             pos * 4 + ($pvE)
      FROM ${p}_w WHERE k < $level),
    ${p}_pos AS (
      SELECT $keys, face, i, j, pos FROM ${p}_w WHERE k = $level)"""
  }

  /** Unsigned-64 cell id (HUGEINT) at `level` from a walk done at
    * `walkLevel ≥ level` — drop 2 position bits per extra level
    * (Hilbert prefixes are ancestors), then face | pos | level marker.
    */
  def idAt(face: String, pos: String, walkLevel: Int, level: Int): String = {
    val dropped = s"(($pos) >> ${2 * (walkLevel - level)})"
    s"""(CAST($face AS HUGEINT) * ${BigInt(2).pow(61)}::HUGEINT
       | + $dropped * ${BigInt(2).pow(61 - 2 * level)}::HUGEINT
       | + ${BigInt(2).pow(60 - 2 * level)}::HUGEINT)""".stripMargin
  }

  /** rangeMin/rangeMax of a level-`level` id (HUGEINT). */
  def rangeMin(id: String, level: Int): String =
    s"(($id) - ${BigInt(2).pow(2 * (30 - level)) - 1}::HUGEINT)"
  def rangeMax(id: String, level: Int): String =
    s"(($id) + ${BigInt(2).pow(2 * (30 - level)) - 1}::HUGEINT)"
}
