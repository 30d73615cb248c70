package graft.queries

/** DuckDB transcription of zero-key SipHash-2-4 and the intHash64
  * avalanche mixer (round-16 verdict task 8 — the LAST oracle-free
  * gate entry): 64-bit wrapping arithmetic emulated on HUGEINT by
  * masking to 2^64−1 after every add/shift, rotations spelled as
  * (x<<b | x>>64−b) & mask, and the 64×64→64 multiplies of intHash64
  * split into 32-bit halves so no intermediate exceeds HUGEINT's
  * signed-128 range. The message walk is a recursive CTE: one step
  * per phase (xor word into v3 / sipround / sipround / xor word into
  * v0, then the 0xff finalization xor and four final rounds), with
  * the per-row little-endian word array built once from
  * hex(encode(text)). Validated cell-for-cell against CHash
  * (functions/Hashes.scala — itself pinned to the published
  * Aumasson–Bernstein vectors in HashesSpec) on both fixtures before
  * landing; the driver's gate now re-proves it every round.
  */
object SipHashSql {

  private val Mask = "18446744073709551615::HUGEINT"

  private def rot(x: String, b: Int): String =
    s"(((($x) << $b) | (($x) >> ${64 - b})) & $Mask)"

  /** One sipround as four simultaneous-assignment SQL expressions of
    * the previous state columns.
    */
  private def sipround(v0: String, v1: String, v2: String, v3: String)
      : (String, String, String, String) = {
    val a0 = s"((($v0) + ($v1)) & $Mask)"
    val a1 = s"xor(${rot(v1, 13)}, $a0)"
    val a0r = rot(a0, 32)
    val a2 = s"((($v2) + ($v3)) & $Mask)"
    val a3 = s"xor(${rot(v3, 16)}, $a2)"
    val b0 = s"((($a0r) + ($a3)) & $Mask)"
    val b3 = s"xor(${rot(a3, 21)}, $b0)"
    val b2 = s"((($a2) + ($a1)) & $Mask)"
    val b1 = s"xor(${rot(a1, 17)}, $b2)"
    val c2 = rot(b2, 32)
    (b0, b1, c2, b3)
  }

  /** 64-bit wrapping multiply by a constant, via 32-bit half products
    * (full product of two 64-bit values would overflow HUGEINT).
    */
  private def mul64(x: String, c: BigInt): String = {
    val loC = c & 0xffffffffL
    val hiC = c >> 32
    val lo = s"(($x) & 4294967295::HUGEINT)"
    val hi = s"(($x) >> 32)"
    val cross =
      s"((($lo) * $hiC::HUGEINT + ($hi) * $loC::HUGEINT) & 4294967295::HUGEINT)"
    s"((($lo) * $loC::HUGEINT + ($cross << 32)) & $Mask)"
  }

  /** intHash64 (murmur fmix64) of a non-negative HUGEINT expression. */
  def intHash64(x: String): String = {
    val y1 = s"xor(($x), ($x) >> 33)"
    val m1 = mul64(y1, BigInt("ff51afd7ed558ccd", 16))
    val y2 = s"xor($m1, ($m1) >> 33)"
    val m2 = mul64(y2, BigInt("c4ceb9fe1a85ec53", 16))
    s"xor($m2, ($m2) >> 33)"
  }

  /** Two's-complement BIGINT view of an unsigned-64 HUGEINT expr. */
  def signed(u: String): String =
    s"""CAST(CASE WHEN ($u) > 9223372036854775807::HUGEINT
       |     THEN ($u) - 18446744073709551616::HUGEINT
       |     ELSE ($u) END AS BIGINT)""".stripMargin

  /** The scalar_ch_hashes oracle: sipHash64(text), intHash64(doc_id)
    * and the sipHash-derived shard over the filtered documents rows.
    */
  val scalarChHashesOracle: String = {
    val (r0, r1, r2, r3) = sipround("v0", "v1", "v2", "v3")
    // zero-key initial state: the four SipHash constants verbatim
    s"""
    WITH RECURSIVE src AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
    bb AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text))::INT AS ln
      FROM src),
    w AS (
      SELECT doc_id, ln // 8 AS nfull,
        list_transform(range(0, ln // 8 + 1), wi ->
          CASE WHEN wi < ln // 8 THEN
            CAST(list_sum(list_transform(range(0, 8), j ->
              ('0x' || substr(hx, (8*wi + j)*2 + 1, 2))::BIGINT::HUGEINT
                << (8*j))) AS HUGEINT)
          ELSE
            ((ln % 256)::HUGEINT << 56) |
            CAST(coalesce(list_sum(list_transform(range(0, ln % 8), j ->
              ('0x' || substr(hx, (8*wi + j)*2 + 1, 2))::BIGINT::HUGEINT
                << (8*j))), 0::HUGEINT) AS HUGEINT)
          END) AS words
      FROM bb),
    st AS (
      SELECT doc_id, nfull + 1 AS nw, 0 AS t,
             8317987319222330741::HUGEINT AS v0,
             7237128888997146477::HUGEINT AS v1,
             7816392313619706465::HUGEINT AS v2,
             8387220255154660723::HUGEINT AS v3
      FROM w
      UNION ALL
      SELECT st.doc_id, st.nw, st.t + 1,
        CASE WHEN (st.t < 4*st.nw AND st.t % 4 IN (1,2)) OR st.t > 4*st.nw
               THEN $r0
             WHEN st.t < 4*st.nw AND st.t % 4 = 3
               THEN xor(v0, w.words[st.t // 4 + 1])
             ELSE v0 END,
        CASE WHEN (st.t < 4*st.nw AND st.t % 4 IN (1,2)) OR st.t > 4*st.nw
               THEN $r1 ELSE v1 END,
        CASE WHEN (st.t < 4*st.nw AND st.t % 4 IN (1,2)) OR st.t > 4*st.nw
               THEN $r2
             WHEN st.t = 4*st.nw THEN xor(v2, 255::HUGEINT)
             ELSE v2 END,
        CASE WHEN (st.t < 4*st.nw AND st.t % 4 IN (1,2)) OR st.t > 4*st.nw
               THEN $r3
             WHEN st.t < 4*st.nw AND st.t % 4 = 0
               THEN xor(v3, w.words[st.t // 4 + 1])
             ELSE v3 END
      FROM st JOIN w ON w.doc_id = st.doc_id
      WHERE st.t < 4*st.nw + 5),
    fin AS (
      SELECT doc_id, xor(xor(v0, v1), xor(v2, v3)) AS u
      FROM st WHERE t = 4*nw + 5)
    SELECT s.doc_id,
           ${signed("f.u")} AS sip,
           ${signed(intHash64("s.doc_id::HUGEINT"))} AS ih,
           CAST(f.u % 64 AS BIGINT) AS shard
    FROM src s JOIN fin f USING (doc_id)
    ORDER BY s.doc_id"""
  }
}
