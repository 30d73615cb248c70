package graft

import graft.functions.GraftFunctions
import graft.ops.{SemDedup, SemDedupParams, Vectors}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The parameterized semantic-dedup operator (r19 verdict task 1) and
  * its codegen kernels:
  *
  *  1. `signed_feature_fold` / `hyperplane_dots` produce values
  *     BIT-IDENTICAL to the r18 SQL higher-order-function chain they
  *     replace (the chain the DuckDB gate oracle re-derives), on the
  *     real sf0.001 documents fixture;
  *  2. both kernels survive `spark.sql.codegen.fallback=false` (no
  *     silent interpreted fallback);
  *  3. parameter plumbing: band-key geometry follows
  *     (bands, bitsPerBand), invalid parameters refuse loudly;
  *  4. the full operator output at defaults is self-consistent
  *     (members ≥ 2 per cluster, keep_id is a member, weights
  *     positive) — VALUE correctness is the DuckDB gate's job
  *     (pipe_semdedup / pipe_semdedup_b24 hash-checks).
  */
class SemDedupSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  private def withNoFallback[T](body: => T): T = {
    val conf = spark.conf
    val prev = conf.getOption("spark.sql.codegen.fallback")
    conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => conf.set("spark.sql.codegen.fallback", v)
      case None => conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("signed_feature_fold + hyperplane_dots == the r18 SQL chain, bit-exact") {
    GraftFunctions.register(spark)
    val planes = Vectors.planesSparkSql(64, 64)
    val docs = Tables(spark, sfDir, "documents")
      .withColumn("sh", array_distinct(
        graft.ops.Text.shingles(graft.ops.Text.tokens($"text"), 3)))
    // the replaced r18 expressions, verbatim
    val old = docs
      .withColumn("fh", expr(
        """transform(sh, s -> struct(
          |  CAST(conv(substring(md5(concat('fh|', s)), 1, 15), 16, 10) AS BIGINT) % 64 AS idx,
          |  CASE WHEN CAST(conv(substring(md5(concat('fs|', s)), 1, 15), 16, 10) AS BIGINT) % 2 = 0
          |       THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END AS sgn))""".stripMargin))
      .withColumn("v_old", expr(
        """aggregate(fh, array_repeat(CAST(0.0 AS DOUBLE), 64),
          |  (acc, e) -> transform(acc, (x, i) ->
          |     CASE WHEN e.idx = i THEN x + e.sgn ELSE x END))""".stripMargin))
      .withColumn("dots_old", expr(
        s"""transform(sequence(0, 63), p ->
           |  aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE),
           |    (a, d) -> a + element_at(element_at($planes, p + 1), d)
           |                  * element_at(v_old, d)))""".stripMargin))
    val both = withNoFallback {
      old
        .withColumn("v_new", expr("signed_feature_fold(sh, 64)"))
        .withColumn("dots_new", expr("hyperplane_dots(v_new, 64)"))
        .select(
          count(lit(1)).as("n"),
          sum(when($"v_old" === $"v_new", 0).otherwise(1)).as("v_diff"),
          sum(when($"dots_old" === $"dots_new", 0).otherwise(1)).as("d_diff"))
        .collect()(0)
    }
    assert(both.getLong(0) > 0)
    assert(both.getLong(1) == 0, "feature-fold vectors diverge")
    assert(both.getLong(2) == 0, "hyperplane dots diverge")
  }

  test("fold semantics: null elements are no-ops, empty array is a zero vector") {
    GraftFunctions.register(spark)
    val r = withNoFallback {
      spark.sql(
        """SELECT signed_feature_fold(array('a', CAST(NULL AS STRING), 'a'), 8) AS v,
          |       signed_feature_fold(CAST(array() AS ARRAY<STRING>), 8) AS z,
          |       hyperplane_dots(signed_feature_fold(CAST(array() AS ARRAY<STRING>), 8), 16) AS zd
          |""".stripMargin).collect()(0)
    }
    val v = r.getSeq[Double](0)
    assert(v.length == 8 && math.abs(v.map(math.abs).sum - 2.0) < 1e-12,
      s"'a' twice must land ±2 in one slot: $v") // same shingle → same slot+sign
    assert(v.count(_ != 0.0) == 1)
    assert(r.getSeq[Double](1).forall(_ == 0.0))
    assert(r.getSeq[Double](2).length == 16 && r.getSeq[Double](2).forall(_ == 0.0))
  }

  test("band keys follow (bands, bitsPerBand); packed bits match the dot signs") {
    GraftFunctions.register(spark)
    val vecs = SemDedup.featureVecs(
      Tables(spark, sfDir, "documents").limit(20), "doc_id", "text",
      SemDedupParams(bands = 2, bitsPerBand = 24))
    val bk = SemDedup.bandKeys(vecs, "doc_id", SemDedupParams(bands = 2, bitsPerBand = 24))
    val rows = bk.groupBy($"doc_id").agg(
      count(lit(1)).as("n"),
      collect_set(split($"bk", ":").getItem(0)).as("bandIds")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 2, "two band keys per doc")
      assert(r.getSeq[String](2).toSet == Set("0", "1"))
    }
    // cross-check one doc's first band against its dots
    val one = vecs.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"dots").collect()(0)
    val dots = one.getSeq[Double](1)
    assert(dots.length == 48, "2 bands × 24 bits = 48 planes")
    val expected = (0 until 24).map(q => if (dots(q) > 0) 1L << q else 0L).sum
    val got = bk.filter($"doc_id" === one.getLong(0) && $"bk".startsWith("0:"))
      .select(split($"bk", ":").getItem(1).cast("long")).collect()(0).getLong(0)
    assert(got == expected, s"band-0 bits $got != $expected")
  }

  test("invalid parameters refuse loudly") {
    intercept[IllegalArgumentException](SemDedupParams(bitsPerBand = 63))
    intercept[IllegalArgumentException](SemDedupParams(bands = 0))
    intercept[IllegalArgumentException](SemDedupParams(dims = 0))
    intercept[IllegalArgumentException](SemDedupParams(simThreshold = 0.0))
    intercept[IllegalArgumentException](SemDedupParams(cap = 0))
  }

  test("operator end-to-end at defaults: cluster invariants on sf0.001") {
    val p = SemDedupParams()
    val prs = SemDedup.pairs(Tables(spark, sfDir, "documents"), "doc_id", "text", p)
      .persist()
    try {
      val out = SemDedup.clusters(prs).collect()
      assert(out.nonEmpty, "sf0.001 plants near-dup twins; clusters expected")
      val members = graft.ops.Graphs.connectedComponents(
        prs.select($"a_id", $"b_id"), "a_id", "b_id")
        .groupBy($"component").agg(collect_set($"id").as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
      out.foreach { r =>
        val comp = r.getLong(0)
        assert(r.getLong(1) >= 2, "a cluster has at least two members")
        assert(r.getLong(1) == members(comp).size.toLong)
        assert(members(comp).contains(r.getLong(2)), "keep_id is a member")
        assert(r.getDouble(3) >= p.simThreshold,
          "medoid weight at least one confirmed cosine")
      }
    } finally prs.unpersist()
  }
}
