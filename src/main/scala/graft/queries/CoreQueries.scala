package graft.queries

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1–2.2, §2.6–2.7: scans, projection/filter/HAVING,
  * sorts/limits/distinct, set operations. All pure Spark builtins —
  * Catalyst handles pushdown, pruning, TopK fusion (§4).
  */
object CoreQueries {

  /** TPC-H-Q1-shaped flagship: scan → filter → hash agg (partial/final)
    * → sort. Exercises predicate pushdown into the parquet scan and
    * whole-stage codegen end to end.
    */
  def q1(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        Det.dsum($"l_quantity").as("sum_qty"),
        Det.dsum($"l_extendedprice").as("sum_base_price"),
        Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")).as("sum_charge"),
        Det.davg($"l_quantity").as("avg_qty"),
        Det.davg($"l_extendedprice").as("avg_price"),
        Det.davg($"l_discount").as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val defs: Seq[QDef] = Seq(
    QDef("q1_flagship", q1, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${Det.sqlSum("l_quantity")} AS sum_qty,
        ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
        ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
        ${Det.sqlSum("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)")} AS sum_charge,
        ${Det.sqlAvg("l_quantity")} AS avg_qty,
        ${Det.sqlAvg("l_extendedprice")} AS avg_price,
        ${Det.sqlAvg("l_discount")} AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""")),

    // Columnar scan + min/max — the MergeTree-scan analog; row-group
    // stats answer min/max without reading all pages.
    QDef("scan_minmax", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        min($"l_shipdate").cast("date").as("min_ship"),
        max($"l_shipdate").cast("date").as("max_ship"),
        min($"l_quantity").as("min_qty"),
        max($"l_quantity").as("max_qty"))
    }, Some("""
      SELECT count(*) AS n_rows,
             CAST(min(l_shipdate) AS DATE) AS min_ship,
             CAST(max(l_shipdate) AS DATE) AS max_ship,
             min(l_quantity) AS min_qty,
             max(l_quantity) AS max_qty
      FROM lineitem""")),

    // Projection + predicate filter (WHERE/PREWHERE collapse to parquet
    // pushdown in Spark — SURVEY.md §2.2).
    QDef("filter_project", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_quantity" > 45 &&
          $"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp"))
        .select(
          $"l_orderkey", $"l_linenumber",
          // extendedprice(2dp) × (1-discount)(2dp) is exactly 4dp, so
          // round(..,4) has no .5 ties (Spark HALF_UP vs DuckDB would
          // disagree at 2dp).
          round($"l_extendedprice" * (lit(1.0) - $"l_discount"), 4).as("net"),
          concat($"l_returnflag", lit("/"), $"l_linestatus").as("flag"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }, Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1.0 - l_discount), 4) AS net,
             l_returnflag || '/' || l_linestatus AS flag
      FROM lineitem
      WHERE l_quantity > 45
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      ORDER BY l_orderkey, l_linenumber""")),

    // Post-aggregation filter (HAVING).
    QDef("having_filter", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("cnt"), Det.dsum($"l_quantity").as("qty"))
        .filter($"cnt" > 550)
        .orderBy($"l_suppkey")
    }, Some(s"""
      SELECT l_suppkey, count(*) AS cnt, ${Det.sqlSum("l_quantity")} AS qty
      FROM lineitem GROUP BY l_suppkey HAVING count(*) > 550
      ORDER BY l_suppkey""")),

    // ORDER BY with NULLS FIRST and a multi-key total order.
    QDef("orderby_nulls", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 100 === 0)
        .select($"o_orderkey",
          nullif($"o_orderstatus", lit("O")).as("status_or_null"),
          $"o_totalprice")
        .orderBy($"status_or_null".asc_nulls_first, $"o_orderkey")
    }, Some("""
      SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_or_null, o_totalprice
      FROM orders WHERE o_orderkey % 100 = 0
      ORDER BY status_or_null ASC NULLS FIRST, o_orderkey""")),

    // LIMIT/OFFSET over a total order (TakeOrderedAndProject in the
    // physical plan — CH's heap-based partial sort, §2.6).
    QDef("limit_offset", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
        .offset(10).limit(50)
    }, Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 50 OFFSET 10""")),

    // DISTINCT.
    QDef("distinct_pairs", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .select($"l_returnflag", $"l_linestatus").distinct()
        .orderBy($"l_returnflag", $"l_linestatus")
    }, Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""")),

    // UNION ALL (multiset, folded to counts for determinism).
    QDef("setop_union_all", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").select($"c_nationkey".as("k"))
      val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("k"))
      c.union(sup).groupBy($"k").agg(count(lit(1)).as("cnt")).orderBy($"k")
    }, Some("""
      SELECT k, count(*) AS cnt FROM (
        SELECT c_nationkey AS k FROM customer
        UNION ALL SELECT s_nationkey AS k FROM supplier)
      GROUP BY k ORDER BY k""")),

    // UNION DISTINCT / INTERSECT / EXCEPT.
    QDef("setop_union_distinct", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").select($"c_nationkey".as("k"))
      val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("k"))
      c.union(sup).distinct().orderBy($"k")
    }, Some("""
      SELECT c_nationkey AS k FROM customer
      UNION SELECT s_nationkey AS k FROM supplier ORDER BY k""")),

    QDef("setop_intersect", (s, dir) => {
      import s.implicits._
      val big = Tables(s, dir, "customer").filter($"c_acctbal" > 0)
        .select($"c_nationkey".as("k"))
      val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("k"))
      big.intersect(sup).orderBy($"k")
    }, Some("""
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 0
      INTERSECT SELECT s_nationkey AS k FROM supplier ORDER BY k""")),

    QDef("setop_except", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").select($"c_nationkey".as("k"))
      val sup = Tables(s, dir, "supplier").select($"s_nationkey".as("k"))
      c.except(sup).orderBy($"k")
    }, Some("""
      SELECT c_nationkey AS k FROM customer
      EXCEPT SELECT s_nationkey AS k FROM supplier ORDER BY k""")),

    // Synthetic source: spark.range ≈ ClickHouse numbers(N) (§2.1).
    QDef("numbers_source", (s, _) => {
      import s.implicits._
      s.range(1, 1001)
        .select($"id", ($"id" * $"id").as("sq"))
        .agg(count(lit(1)).as("n"), sum($"sq").as("sum_sq"),
          sum(when($"id" % 7 === 0, $"id")).as("sum_mult7"))
    }, Some("""
      SELECT count(*) AS n, CAST(sum(i * i) AS BIGINT) AS sum_sq,
             CAST(sum(CASE WHEN i % 7 = 0 THEN i END) AS BIGINT) AS sum_mult7
      FROM (SELECT CAST(range AS BIGINT) AS i FROM range(1, 1001))"""))
  )
}
