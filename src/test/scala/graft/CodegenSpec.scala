package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic regression for the codegen local-variable collision:
  * stacking two `cosine_sim` calls (plus a `point_in_polygon`) in ONE
  * projection puts all their generated locals into one Janino function.
  * With hardcoded names (`int i`, `double dot`, …) Janino throws
  * "Redefinition of local variable" and Spark silently falls back to
  * interpreted eval — invisible to correctness tests, a fast-path loss
  * at scale. `spark.sql.codegen.fallback=false` turns that silent
  * fallback into a test failure, so this spec pins the `ctx.freshName`
  * fix in CosineSimilarity/PointInPolygon doGenCode.
  */
class CodegenSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

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

  test("two cosine_sim + point_in_polygon in one projection compile under codegen.fallback=false") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f), Array(0.0f, 1.0f), 0.5, 0.5),
      (Array(3.0f, 4.0f), Array(4.0f, 3.0f), Array(0.0f, 5.0f), 2.0, 2.0)
    ).toDF("a", "b", "c", "px", "py")
      .withColumn("poly", expr(
        "array(named_struct('x', 0.0d, 'y', 0.0d), named_struct('x', 1.0d, 'y', 0.0d)," +
          " named_struct('x', 1.0d, 'y', 1.0d), named_struct('x', 0.0d, 'y', 1.0d))"))

    val out = withNoFallback {
      df.select(
        expr("cosine_sim(a, b)").as("s1"),
        expr("cosine_sim(a, c)").as("s2"),
        expr("point_in_polygon(px, py, poly)").as("inside"),
        expr("point_in_polygon(py, px, poly)").as("inside2")
      ).collect()
    }

    assert(out.length == 2)
    val r0 = out(0)
    assert(math.abs(r0.getDouble(0) - 1.0) < 1e-12)          // a·a / |a||a|
    assert(math.abs(r0.getDouble(1) - 0.0) < 1e-12)          // orthogonal
    assert(r0.getBoolean(2) && r0.getBoolean(3))             // (0.5,0.5) in unit square
    val r1 = out(1)
    assert(math.abs(r1.getDouble(0) - 24.0 / 25.0) < 1e-12)  // (3,4)·(4,3)/25
    assert(math.abs(r1.getDouble(1) - 20.0 / 25.0) < 1e-12)  // (3,4)·(0,5)/25
    assert(!r1.getBoolean(2))                                // (2,2) outside
  }

  test("cosine_sim interpreted and codegen paths agree") {
    GraftFunctions.register(spark)
    val df = Seq((Array(0.3f, -1.2f, 2.5f), Array(1.1f, 0.4f, -0.7f)))
      .toDF("a", "b")
    val gen = withNoFallback {
      df.select(expr("cosine_sim(a, b)")).head().getDouble(0)
    }
    // Interpreted: route through an eval-only context (filter on the value
    // forces eval in the optimizer's constant-folding-free path is not
    // guaranteed, so just call nullSafeEval directly).
    val e = graft.functions.CosineSimilarity(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(0.3f, -1.2f, 2.5f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array(1.1f, 0.4f, -0.7f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)))
    val interp = e.eval(null).asInstanceOf[Double]
    assert(math.abs(gen - interp) < 1e-15)
  }

  test("subscripted corrMatrix compiles under codegen.fallback=false " +
    "(ElementAt over CreateArray of aggregates — r15 KnownNullable fix)") {
    // Without the KnownNullable wrapper in the matrix builders,
    // ElementAt(CreateArray(aggs…), 1) computes nullable=false but its
    // codegen still assigns ev.isNull in the out-of-bounds branch — an
    // undeclared variable, Janino "isNull_x is not an rvalue", silent
    // interpreted fallback. Constant folding hides the Spark bug for
    // literal arrays; aggregate elements aren't foldable, so this exact
    // shape (3 columns, 4 subscripted references — enough to survive
    // subexpression elimination) is the regression.
    Graft.init(spark, "/root/testdata/sf0.001")
    val r = withNoFallback {
      Graft.sql(spark, """
        SELECT round(corrMatrix(l_quantity, l_extendedprice, l_discount)[1][2], 4) AS r_qp,
               round(corrMatrix(l_quantity, l_extendedprice, l_discount)[1][3], 4) AS r_qd,
               round(corrMatrix(l_quantity, l_extendedprice, l_discount)[2][3], 4) AS r_pd,
               round(covarSampMatrix(l_quantity, l_discount)[1][2], 4) AS cv_qd
        FROM lineitem""").collect()
    }
    assert(r.length == 1 && !r.head.isNullAt(0) && !r.head.isNullAt(3))
    // corr is a dimensionless ratio in [-1, 1]
    assert(math.abs(r.head.getDouble(0)) <= 1.0)
  }
}
