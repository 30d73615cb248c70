package graft

import graft.functions.GraftFunctions
import graft.ops.{Text, Vectors}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the LLM-pipeline primitives: shingling, minhash
  * behavior, simhash invariance, and the codegen cosine expression
  * against a reference implementation.
  */
class TextVectorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shingles produces n-grams and handles short docs") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(Text.shingles(Text.tokens($"text"), 3).as("sh"))
    val out = df.as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1) == Seq.empty)
  }

  test("identical docs share minhash signatures; disjoint docs do not") {
    val df = Seq("x y z w v u t s", "x y z w v u t s", "p q r m n o k j")
      .toDF("text")
      .select(Text.minhashSig(
        array_distinct(Text.shingles(Text.tokens($"text"), 2)), 8).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash signature agreement estimates Jaccard (the LSH contract)") {
    import org.apache.spark.sql.functions._
    // word sets with known overlap: |A∩B|/|A∪B| = 10/30
    val a = (0 until 20).map(i => s"w$i")
    val b = (10 until 30).map(i => s"w$i")
    val df = Seq((a, b)).toDF("a", "b")
      .select(Text.minhashSig(col("a"), 128).as("sa"),
        Text.minhashSig(col("b"), 128).as("sb"))
      .select(expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), m -> m))").as("agree"))
    val agree = df.as[Int].head() / 128.0
    val trueJ = 10.0 / 30.0
    assert(math.abs(agree - trueJ) < 0.12,
      f"minhash estimate $agree%.3f too far from true Jaccard $trueJ%.3f")
  }

  test("xxhash64 production minhash keeps the estimator contract") {
    // hashPairsFast/minhashSigFast (the non-oracle production-hash
    // mode, r16 verdict task 6) must satisfy the SAME estimator
    // property as the md5 family: agreement rate ≈ Jaccard, and both
    // hashes land in [0, 2^55) (pmod, since xxhash64 is signed).
    graft.functions.GraftFunctions.register(spark)
    val a = (0 until 20).map(i => s"w$i")
    val b = (10 until 30).map(i => s"w$i")
    val df = Seq((a, b)).toDF("a", "b")
      .select(Text.minhashSigFast(col("a"), 128).as("sa"),
        Text.minhashSigFast(col("b"), 128).as("sb"))
    val agree = df
      .select(expr("size(filter(zip_with(sa, sb, (x, y) -> x = y), m -> m))").as("agree"))
      .as[Int].head() / 128.0
    val trueJ = 10.0 / 30.0
    assert(math.abs(agree - trueJ) < 0.12,
      f"fast-minhash estimate $agree%.3f too far from true Jaccard $trueJ%.3f")
    val range = Seq(Seq("alpha", "beta", "gamma")).toDF("t")
      .select(Text.hashPairsFast(col("t")).as("hp"))
      .select(expr(
        s"""forall(hp, p -> p.h1 >= 0 AND p.h1 < ${Text.MinhashMod}
                        AND p.h2 >= 0 AND p.h2 < ${Text.MinhashMod})""").as("ok"))
      .as[Boolean].head()
    assert(range, "fast hashes must be non-negative 55-bit values")
    // and it is genuinely a DIFFERENT hash family than the md5 one
    val md5Sig = Seq(a).toDF("t")
      .select(Text.minhashSig(col("t"), 8).as("s")).as[Seq[Long]].head()
    val xxSig = Seq(a).toDF("t")
      .select(Text.minhashSigFast(col("t"), 8).as("s")).as[Seq[Long]].head()
    assert(md5Sig != xxSig)
  }

  test("jaccard on distinct arrays") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
      .select(Text.jaccard($"x", $"y").as("j"))
    assert(math.abs(df.as[Double].head() - 0.5) < 1e-12)
  }

  test("simhash is invariant to token order (set semantics)") {
    val df = Seq("alpha beta gamma delta", "delta gamma beta alpha", "zz yy xx ww")
      .toDF("text")
      .withColumn("tokset", array_distinct(Text.tokens($"text")))
      .selectExpr(Text.simhash32Sql("tokset") + " AS h")
    val hs = df.as[Long].collect()
    assert(hs(0) == hs(1))
    assert(hs(0) != hs(2))
  }

  test("cosine_sim codegen matches a reference double loop and handles nulls") {
    GraftFunctions.register(spark)
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-2.0f, 0.5f, 1.5f)
    val df = Seq((a, b)).toDF("x", "y")
      .selectExpr("cosine_sim(x, y) AS s")
    def ref(x: Array[Float], y: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- x.indices) {
        dot += x(i).toDouble * y(i); na += x(i).toDouble * x(i); nb += y(i).toDouble * y(i)
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    assert(df.as[Double].head() == ref(a, b))
    val withNull = Seq((a, null.asInstanceOf[Array[Float]])).toDF("x", "y")
      .selectExpr("cosine_sim(x, y) AS s")
    assert(withNull.collect().head.isNullAt(0))
  }

  test("LSH planes are ±1 and reproducible") {
    val p1 = Vectors.planeMatrix(4, 16)
    val p2 = Vectors.planeMatrix(4, 16)
    assert(p1 == p2)
    assert(p1.flatten.forall(v => v == 1.0 || v == -1.0))
    // not degenerate: both signs present
    assert(p1.flatten.distinct.size == 2)
  }
}
