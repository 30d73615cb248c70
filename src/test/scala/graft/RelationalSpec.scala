package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unit tests for the relational helpers (SURVEY §2.1/§2.6). */
class RelationalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("replacingLatest keeps exactly the newest version per key") {
    val df = Seq((1L, 1, "old"), (1L, 3, "new"), (1L, 2, "mid"), (2L, 1, "only"))
      .toDF("k", "ver", "v")
    val out = Relational.replacingLatest(df, Seq("k"), Seq($"ver")).orderBy("k")
    assert(out.select("v").as[String].collect().toSeq == Seq("new", "only"))
  }

  test("collapse drops cancelled sign groups") {
    val df = Seq((1L, 1), (1L, -1), (2L, 1), (2L, 1), (2L, -1)).toDF("k", "sign")
    val out = Relational.collapse(df, Seq("k"), $"sign")
    assert(out.select("k").as[Long].collect().toSeq == Seq(2L))
  }

  test("limitBy keeps first n per group in order") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "x")
    val out = Relational.limitBy(df, Seq("g"), 2, Seq($"x".asc)).orderBy("g", "x")
    assert(out.select("x").as[Int].collect().toSeq == Seq(1, 2, 9))
  }

  test("distinctOn is a deterministic ordered pick") {
    val df = Seq(("a", 3, "z"), ("a", 3, "y"), ("b", 1, "w")).toDF("g", "x", "t")
    val out = Relational.distinctOn(df, Seq("g"), Seq($"x".desc, $"t".asc)).orderBy("g")
    assert(out.select("t").as[String].collect().toSeq == Seq("y", "w"))
  }

  test("versionedCollapse keeps the highest positive-net version per key") {
    // key 1: v1 live; key 2: v1 cancelled, v2 live (updated payload);
    // key 3: both versions cancelled — fully deleted
    val df = Seq(
      (1L, 1, 1, "a1"),
      (2L, 1, 1, "b1"), (2L, 1, -1, "b1"), (2L, 2, 1, "b2"),
      (3L, 1, 1, "c1"), (3L, 1, -1, "c1"), (3L, 2, 1, "c2"), (3L, 2, -1, "c2"))
      .toDF("k", "ver", "sign", "v")
    val out = Relational.versionedCollapse(df, Seq("k"), "ver", "sign").orderBy("k")
    assert(out.select($"k", $"ver", $"v").as[(Long, Int, String)].collect().toSeq ==
      Seq((1L, 1, "a1"), (2L, 2, "b2")))
  }

  test("versionedCollapseFinal keeps EVERY uncancelled version (upstream FINAL)") {
    // key 1: v1 and v2 both live → FINAL returns both, latest-state
    // view returns only v2; key 2: v2 cancelled → v1 only
    val df = Seq(
      (1L, 1, 1, "a1"), (1L, 2, 1, "a2"),
      (2L, 1, 1, "b1"), (2L, 2, 1, "b2"), (2L, 2, -1, "b2"))
      .toDF("k", "ver", "sign", "v")
    val fin = Relational.versionedCollapseFinal(df, Seq("k"), "ver", "sign")
      .orderBy("k", "ver")
    assert(fin.select($"k", $"ver", $"v").as[(Long, Int, String)].collect().toSeq ==
      Seq((1L, 1, "a1"), (1L, 2, "a2"), (2L, 1, "b1")))
    val latest = Relational.versionedCollapse(df, Seq("k"), "ver", "sign").orderBy("k")
    assert(latest.select($"k", $"ver").as[(Long, Int)].collect().toSeq ==
      Seq((1L, 2), (2L, 1)))
  }

  test("versionedCollapse nets duplicate (key, version) inserts") {
    // two +1 rows and one -1 at the same version: net +1 → still live
    val df = Seq((1L, 1, 1, "x"), (1L, 1, 1, "x"), (1L, 1, -1, "x"))
      .toDF("k", "ver", "sign", "v")
    val out = Relational.versionedCollapse(df, Seq("k"), "ver", "sign")
    assert(out.count() == 1)
  }

  test("row TTL keeps the trailing window relative to the frame's own max") {
    val df = Seq("2024-01-01", "2024-03-01", "2024-03-20", "2024-04-01")
      .toDF("d").select(to_timestamp($"d").as("ts"))
    val out = Relational.applyRowTtl(df, "ts", "20 DAY")
    assert(out.count() == 2) // cutoff 03-12: only 03-20 and 04-01 survive
  }

  test("column TTL nulls past the horizon while the row survives") {
    val df = Seq(("2024-01-01", "old"), ("2024-04-01", "new"))
      .toDF("d", "c").select(to_timestamp($"d").as("ts"), $"c")
    val out = Relational.applyColumnTtl(df, "ts", "30 DAY", Seq("c"))
    assert(out.count() == 2)
    assert(out.orderBy("ts").select("c").as[String].collect().toSeq
      .map(Option(_)) == Seq(None, Some("new")))
  }

  test("withFillStep adds missing grid points and keeps off-grid rows (CH contract)") {
    val df = Seq((2L, 10L), (5L, 20L)).toDF("x", "n")
    val out = Relational.withFillStep(df, "x", 1L, 7L, 2L, Map("n" -> lit(0L)))
      .orderBy("x")
    // grid = 1,3,5; x=2 is off-grid but SURVIVES; 1 and 3 are added
    assert(out.select("x", "n").as[(Long, Long)].collect().toSeq ==
      Seq((1L, 0L), (2L, 10L), (3L, 0L), (5L, 20L)))
  }

  test("withFillDays fills calendar gaps with the given default") {
    val df = Seq(("2024-01-01", 5L), ("2024-01-04", 7L))
      .toDF("d", "n").select(to_date($"d").as("day"), $"n")
    val out = Relational.withFillDays(df, "day", Map("n" -> lit(0L))).orderBy("day")
    assert(out.count() == 4)
    assert(out.select("n").as[Long].collect().toSeq == Seq(5L, 0L, 0L, 7L))
  }
}
