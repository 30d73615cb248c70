package graft

import graft.ops.Joins
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the custom join operators (SURVEY §2.3): the edge
  * cases the oracle queries don't reach — equal-ts ties, no-match
  * nulls, multi-key grouping, tie-break determinism.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofJoin takes an exact-ts match (<=, not <)") {
    val l = Seq((1L, 100L)).toDF("k", "ts")
    val r = Seq((1L, 100L, "atTs"), (1L, 50L, "before")).toDF("k", "ts", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.select("asof_v").as[String].collect().toSeq == Seq("atTs"))
  }

  test("asofJoin yields null when no right row precedes") {
    val l = Seq((1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 50L, "later")).toDF("k", "ts", "v")
    val out = Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("v"))
    assert(out.select("asof_v").collect().toSeq == Seq(Row(null)))
  }

  test("asofJoin matches only within the same key group") {
    val l = Seq((1L, "a", 100L), (1L, "b", 100L), (2L, "a", 100L)).toDF("k1", "k2", "ts")
    val r = Seq((1L, "a", 90L, "r1a"), (1L, "b", 80L, "r1b")).toDF("k1", "k2", "ts", "v")
    val out = Joins.asofJoin(l, r, Seq("k1", "k2"), "ts", "ts", Seq("v"))
      .orderBy("k1", "k2")
    assert(out.select("asof_v").as[String].collect().toSeq == Seq("r1a", "r1b", null))
  }

  test("asofJoin picks latest preceding, and tieBreak resolves equal-ts rights") {
    val l = Seq((1L, 100L)).toDF("k", "ts")
    val r = Seq((1L, 90L, "x", 1L), (1L, 90L, "y", 2L), (1L, 10L, "old", 3L))
      .toDF("k", "ts", "v", "uid")
    val out = Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("v"),
      tieBreak = Seq("uid"))
    // greatest tie-break value wins
    assert(out.select("asof_v").as[String].collect().toSeq == Seq("y"))
  }

  // DuckDB 1.0 reference (probed): l=(1,5),(1,10); r=(1,5,50),(1,7,70),(1,12,120)
  //   >= → (5→50),(10→70)   > → (5→null),(10→70)
  //   <= → (5→50),(10→120)  < → (5→70),(10→120)
  test("asofJoin supports all four CH inequality directions") {
    val l = Seq((1L, 5L), (1L, 10L)).toDF("k", "ts")
    val r = Seq((1L, 5L, 50L), (1L, 7L, 70L), (1L, 12L, 120L)).toDF("k", "ts", "v")
    def run(op: String): Seq[Any] =
      Joins.asofJoin(l, r, Seq("k"), "ts", "ts", Seq("v"), op = op)
        .orderBy("ts").select("asof_v").collect().map(_.get(0)).toSeq
    assert(run(">=") == Seq(50L, 70L))
    assert(run(">") == Seq(null, 70L))
    assert(run("<=") == Seq(50L, 120L))
    assert(run("<") == Seq(70L, 120L))
  }

  test("asofJoin all four directions match brute force on seeded random data") {
    val rnd = new scala.util.Random(421L)
    // duplicate timestamps on both sides on purpose — the inclusive/
    // strict boundary is where bugs live
    val l = Seq.fill(120)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
    val r = Seq.fill(90)((rnd.nextInt(4).toLong, rnd.nextInt(30).toLong))
      .distinct // unique (k, ts): the operator pins determinism on it
      .map { case (k, t) => (k, t, k * 1000 + t) }
    val lDf = l.toDF("k", "ts")
    val rDf = r.toDF("k", "ts", "v")
    def brute(op: String): Map[(Long, Long), Option[Long]] =
      l.distinct.map { case (k, t) =>
        val cand = r.filter { case (rk, rt, _) =>
          rk == k && (op match {
            case ">=" => t >= rt
            case ">" => t > rt
            case "<=" => t <= rt
            case "<" => t < rt
          })
        }
        val pick =
          if (op == ">=" || op == ">") cand.sortBy(_._2).lastOption
          else cand.sortBy(_._2).headOption
        (k, t) -> pick.map(_._3)
      }.toMap
    for (op <- Seq(">=", ">", "<=", "<")) {
      val got = Joins.asofJoin(lDf, rDf, Seq("k"), "ts", "ts", Seq("v"), op = op)
        .select("k", "ts", "asof_v").distinct().collect()
        .map(row => (row.getLong(0), row.getLong(1)) ->
          (if (row.isNullAt(2)) None else Some(row.getLong(2)))).toMap
      assert(got == brute(op), s"direction $op diverged from brute force")
    }
  }

  test("anyJoin returns exactly one deterministic match per left row") {
    val l = Seq(1L, 2L, 3L).toDF("k")
    val r = Seq((1L, 10, "a"), (1L, 20, "b"), (2L, 5, "c")).toDF("k", "p", "v")
    val out = Joins.anyJoin(l, r, Seq("k"), Seq($"p".desc, $"v".asc))
      .orderBy("k")
    assert(out.count() == 3)
    assert(out.select("v").as[String].collect().toSeq == Seq("b", "c", null))
  }
}
