package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: a ClickHouse user's interface is SQL over
  * named tables — Graft.init registers views + custom functions so
  * plain spark.sql works end to end.
  */
class GraftSqlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver contract: entry() returns rows and all queries have oracle names") {
    assert(SparkEntry.entry(spark).count() > 0)
    val qs = SparkEntry.queries.keySet
    // keys-only accessor: enumerating the contract must not RESOLVE
    // dynOracle thunks (that would run the IVF k-means build — over
    // whatever SPARK_GRAFT_SF_DIR points at — inside a unit test)
    val os = SparkEntry.oracleDeclaredNames
    // Oracle-free entries get the driver's weaker rows-only check; each
    // would need an explicit justification here (and a non-gate test
    // pinning its semantics elsewhere). EMPTY since r16: the last three
    // holdouts all moved onto the hash gate — scalar_geo_encode
    // (recursive-CTE geohash transcription), pipe_ann_ivf
    // (centroids-as-literals dynOracle), and scalar_ch_hashes
    // (SipHash-2-4 + fmix64 transcribed onto DuckDB HUGEINT,
    // SipHashSql.scala).
    val rowsOnly = Set.empty[String]
    assert(os.subsetOf(qs), s"orphan oracles: ${os.diff(qs)}")
    assert(qs.diff(os) == rowsOnly,
      s"unjustified oracle-free queries: ${qs.diff(os).diff(rowsOnly)}")
  }

  test("plain SQL over registered views, including custom functions") {
    Graft.init(spark, "/root/testdata/sf0.001")
    val top = Graft.sql(spark, """
      SELECT l_returnflag, count(*) AS n,
             round(sum(CAST(l_quantity AS DECIMAL(22,6))), 1) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus <> 'X'
      GROUP BY l_returnflag ORDER BY l_returnflag""").collect()
    assert(top.length == 3)
    assert(top.map(_.getLong(1)).sum == 6000L)

    val sim = Graft.sql(spark, """
      SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 3 ORDER BY a.vec_id""").collect()
    assert(sim.length == 3)
    assert(sim.forall(r => math.abs(r.getDouble(1)) <= 1.0))

    val gen = Graft.sql(spark, """
      SELECT doc_id, pos, shingle
      FROM documents LATERAL VIEW shingle_rows(split(text, ' '), 3) AS pos, shingle
      WHERE doc_id = 0 ORDER BY pos LIMIT 5""").collect()
    assert(gen.length == 5)
    assert(gen.head.getInt(1) == 0)
  }
}
