package graft

import graft.functions.{GraftFunctions, TokenCounts}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** `token_counts` generator (r15): per-document term frequencies
  * finished WITHIN the row — the map-side replacement for
  * `explode + groupBy(doc, tok)` in the lang-id / BM25 pipelines.
  */
class TokenCountsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("known answers: counts, first-occurrence order, empty and null input") {
    GraftFunctions.register(spark)
    val rows = Seq("a b a c b a").toDF("text")
      .select(expr("token_counts(split(text, ' '))"))
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("a", 3L), ("b", 2L), ("c", 1L))) // first-occurrence order
    // split('', ' ') = [''] — one empty token, matching DuckDB's
    // string_split (the cross-engine contract the pipelines rely on)
    val empty = Seq("").toDF("text")
      .select(expr("token_counts(split(text, ' '))"))
      .as[(String, Long)].collect().toSeq
    assert(empty == Seq(("", 1L)))
    // null array generates nothing
    val nul = Seq(Tuple1(null: String)).toDF("text")
      .select(expr("token_counts(split(text, ' '))"))
      .collect()
    assert(nul.isEmpty)
  }

  test("equivalence: token_counts == explode + groupBy on the documents fixture") {
    GraftFunctions.register(spark)
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaGen = docs
      .select($"doc_id", expr("token_counts(split(text, ' '))"))
      .as[(Long, String, Long)].collect().toSet
    val viaShuffle = docs
      .select($"doc_id", explode(split($"text", " ")).as("tok"))
      .groupBy($"doc_id", $"tok").agg(count(lit(1)).as("tf"))
      .as[(Long, String, Long)].collect().toSet
    assert(viaGen == viaShuffle && viaGen.nonEmpty)
  }

  test("property: rows == reference multiset counts, first-occurrence order") {
    // Direct expression eval (no Spark job) over 300 random arrays —
    // small alphabet forces real collisions, arbitrary strings cover
    // the general case, empty string is a legal token.
    val tokGen = Gen.frequency(
      6 -> Gen.oneOf("a", "b", "c", "w1", "w2", ""),
      1 -> Gen.alphaNumStr.map(_.take(8)))
    val arrGen = Gen.listOf(tokGen)
    val p = Prop.forAll(arrGen) { toks =>
      val e = TokenCounts(Literal.create(toks.toArray, ArrayType(StringType)))
      val got = e.eval(InternalRow.empty).iterator.toSeq
        .map(r => (r.getUTF8String(0).toString, r.getLong(1)))
      val ref = toks.zipWithIndex.groupBy(_._1).toSeq
        .map { case (t, xs) => (t, xs.length.toLong, xs.map(_._2).min) }
        .sortBy(_._3).map(t => (t._1, t._2))
      got == ref
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(r.passed, r.status.toString)
  }

  test("unsafe-buffer safety: generated tokens survive lazy streaming") {
    GraftFunctions.register(spark)
    // many rows through one whole-stage pipeline: if tokens were VIEWS
    // into a reused scan buffer instead of clones, later rows would
    // corrupt earlier emissions — distinct token text must round-trip
    val out = spark.range(1000)
      .selectExpr("id", "token_counts(split(concat('t', id, ' t', id), ' '))")
      .as[(Long, String, Long)].collect()
    assert(out.length == 1000)
    assert(out.forall { case (id, tok, tf) => tok == s"t$id" && tf == 2L })
  }
}
