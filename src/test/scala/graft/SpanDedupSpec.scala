package graft

import graft.ops.Text
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** Text.duplicateSpans (exact substring-level dedup, the ExactSubstr
  * shape): planted corpora with known shared regions pin the exact
  * span boundaries — the seed/merge arithmetic the driver gate can
  * only check in aggregate. k=3 keeps the hand-derivable cases small;
  * the operator is k-generic and the gate entry runs k=15.
  */
class SpanDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def spansOf(docs: Seq[(Long, String)], k: Int = 3): Map[Long, Seq[(Long, Long, Long)]] = {
    val s = spark
    import s.implicits._
    Text.duplicateSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map { case Row(id: Long, s0: Long, e0: Long, n: Long) => (id, (s0, e0, n)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toSeq).toMap
  }

  test("cross-doc shared region: exact boundaries, overlapping seeds merge") {
    // A and B share "c d e f g" (A pos 2-6, B pos 2-6): seeds at
    // 2,3,4 on both sides merge into ONE span [2,6] of 5 tokens.
    val m = spansOf(Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x y c d e f g z1 z2 z3"))
    assert(m(1L) === Seq((2L, 6L, 5L)))
    assert(m(2L) === Seq((2L, 6L, 5L)))
  }

  test("intra-doc repetition counts toward minOcc; disjoint regions stay separate spans") {
    // "p q r s" appears at pos 0 and 5 of the SAME doc: dup 3-grams
    // pqr(0,5), qrs(1,6) -> seeds {0,1} and {5,6} -> spans [0,3],[5,8].
    val m = spansOf(Seq(3L -> "p q r s t p q r s u"))
    assert(m(3L) === Seq((0L, 3L, 4L), (5L, 8L, 4L)))
  }

  test("touching covered regions merge into one maximal span") {
    // D = u1..u6; E shares u1-u3 and u4-u6 but separated by zz, so D's
    // seeds land at 0 and 3 only (pos 3 <= prev_end 2 + 1 -> merge):
    // D gets ONE span [0,5]; E keeps two, [0,2] and [4,6].
    val m = spansOf(Seq(
      4L -> "u1 u2 u3 u4 u5 u6",
      5L -> "u1 u2 u3 zz u4 u5 u6"))
    assert(m(4L) === Seq((0L, 5L, 6L)))
    assert(m(5L) === Seq((0L, 2L, 3L), (4L, 6L, 3L)))
  }

  test("docs shorter than k emit nothing; unique docs emit nothing") {
    val m = spansOf(Seq(
      6L -> "s1 s2", // shorter than k
      7L -> "v1 v2 v3 v4 v5", // unique content
      8L -> "w1 w2 w3",
      9L -> "w1 w2 w3")) // exact dup pair, one full-width span each
    assert(!m.contains(6L) && !m.contains(7L))
    assert(m(8L) === Seq((0L, 2L, 3L)))
    assert(m(9L) === Seq((0L, 2L, 3L)))
  }

  test("minOcc=3 requires a third occurrence") {
    val docs = Seq(
      10L -> "m1 m2 m3 m4",
      11L -> "m1 m2 m3 m5",
      12L -> "m1 m2 m3 m6")
    assert(spansOf(docs.take(2), 3).isEmpty === false) // sanity at minOcc=2
    val s = spark
    import s.implicits._
    val m3 = Text.duplicateSpans(docs.take(2).toDF("doc_id", "text"),
      "doc_id", "text", 3, minOcc = 3).count()
    val m3full = Text.duplicateSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", 3, minOcc = 3).count()
    assert(m3 === 0L) // only 2 occurrences
    assert(m3full === 3L) // third doc pushes the seed to 3
  }

  test("cutSpans: exact rebuilt text, untouched docs pass through, full cover empties") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x y c d e f g z1 z2 z3",
      3L -> "q1 q2 q3 q4", // no spans
      8L -> "w1 w2 w3",
      9L -> "w1 w2 w3") // fully covered dup pair
      .toDF("doc_id", "text")
    val spans = Text.duplicateSpans(docs, "doc_id", "text", 3)
    val out = Text.cutSpans(docs, spans, "doc_id", "text")
      .select("doc_id", "text_dedup").collect()
      .map { case Row(id: Long, t: String) => id -> t }.toMap
    assert(out(1L) === "a b h i j")
    assert(out(2L) === "x y z1 z2 z3")
    assert(out(3L) === "q1 q2 q3 q4")
    assert(out(8L) === "" && out(9L) === "")
  }

  test("cutSpans keep-first policy: caller filters the spans frame") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x y c d e f g z1 z2 z3").toDF("doc_id", "text")
    val spans = Text.duplicateSpans(docs, "doc_id", "text", 3)
      .filter(col("doc_id") =!= 1L) // exempt the first occurrence
    val out = Text.cutSpans(docs, spans, "doc_id", "text")
      .select("doc_id", "text_dedup").collect()
      .map { case Row(id: Long, t: String) => id -> t }.toMap
    assert(out(1L) === "a b c d e f g h i j") // kept verbatim
    assert(out(2L) === "x y z1 z2 z3")
  }

  test("fastHash mode: identical span set to the md5 family (hash-family independence)") {
    graft.functions.GraftFunctions.register(spark)
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val md5Spans = Text.duplicateSpans(docs, "doc_id", "text", 15)
      .collect().map(_.toSeq).toSet
    val xxSpans = Text.duplicateSpans(docs, "doc_id", "text", 15, fastHash = true)
      .collect().map(_.toSeq).toSet
    assert(md5Spans.nonEmpty && md5Spans === xxSpans)
  }

  test("fixture invariants at k=15: spans sorted, non-overlapping, >= k tokens") {
    val df = Text.duplicateSpans(
      Tables(spark, "/root/testdata/sf0.001", "documents"),
      "doc_id", "text", 15)
    val rows = df.collect().map { case Row(id: Long, s0: Long, e0: Long, n: Long) =>
      (id, s0, e0, n)
    }
    assert(rows.nonEmpty) // the fixture plants duplicated 15-grams
    assert(rows.forall { case (_, s0, e0, n) => n >= 15 && n === e0 - s0 + 1 })
    rows.groupBy(_._1).values.foreach { sp =>
      val sorted = sp.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e0, _), (_, s1, _, _)) => assert(s1 > e0 + 1)
        case _ => ()
      }
    }
  }
}
