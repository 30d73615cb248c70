package graft.queries

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** End-to-end composite analytics in classic TPC-H shapes — the
  * multi-operator compositions a ClickHouse user actually runs
  * (filter → star join → agg → top-k), exercising join ordering,
  * broadcast selection, partial aggregation, and fused top-k in one
  * plan. Revenue sums go through DECIMAL(22,6) (Det) for
  * executor-count-independent results.
  */
object CompositeQueries {

  val defs: Seq[QDef] = Seq(

    // Q3 shape (shipping priority): revenue of urgent not-yet-shipped
    // orders, top 10 by revenue. Dims filter early; the fused
    // TakeOrderedAndProject bounds the result before the final sort.
    QDef("tpch_q3_shipping", (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
        .filter($"c_mktsegment" === "BUILDING")
        .select($"c_custkey")
      val ord = Tables(s, dir, "orders")
        .filter($"o_orderdate" < "1996-01-01")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val li = Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01")
        .select($"l_orderkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(Det.dsum($"rev").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, o_orderdate, ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1996-01-01'
        AND l_shipdate >= TIMESTAMP '1996-01-01'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10""")),

    // Q5 shape (local-supplier volume): revenue by nation where the
    // customer and supplier share a nation — a 6-table star with the
    // three small dims broadcast.
    QDef("tpch_q5_region", (s, dir) => {
      import s.implicits._
      val region = Tables(s, dir, "region").filter($"r_name" === "ASIA")
      val nation = Tables(s, dir, "nation")
      val cust = Tables(s, dir, "customer").select($"c_custkey", $"c_nationkey")
      val sup = Tables(s, dir, "supplier").select($"s_suppkey", $"s_nationkey")
      val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val li = Tables(s, dir, "lineitem")
        .select($"l_orderkey", $"l_suppkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
        .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
        .groupBy($"n_name")
        .agg(Det.dsum($"rev").as("revenue"))
        .orderBy($"revenue".desc, $"n_name")
    }, Some(s"""
      SELECT n_name, ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name""")),

    // Q10 shape (returned-item reporting): top 20 customers by revenue
    // lost to returns, with their nation — join + agg + fused top-k.
    QDef("tpch_q10_returns", (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
        .filter($"l_returnflag" === "R")
        .select($"l_orderkey",
          ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      val ord = Tables(s, dir, "orders").select($"o_orderkey", $"o_custkey")
      val cust = Tables(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_nationkey", $"c_acctbal")
      val nation = Tables(s, dir, "nation").select($"n_nationkey", $"n_name")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
        .groupBy($"c_custkey", $"c_name", $"n_name")
        .agg(Det.dsum($"rev").as("revenue"),
          round(max($"c_acctbal"), 4).as("acctbal"))
        .orderBy($"revenue".desc, $"c_custkey")
        .limit(20)
    }, Some(s"""
      SELECT c_custkey, c_name, n_name,
             ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             round(max(c_acctbal), 4) AS acctbal
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))
  )
}
