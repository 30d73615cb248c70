package graft.queries

import graft.{Det, QDef, Tables}
import graft.functions.GraftFunctions
import graft.ops.Text
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coverage closers for the remaining SURVEY.md §2 rows: RIGHT OUTER
  * join, INTERSECT/EXCEPT ALL, RANGE window frames, GROUPS-frame
  * emulation, dictGet-as-broadcast-join, the `-Array` combinator
  * family, and the custom row-expanding Generator.
  */
object ExtrasQueries {

  val defs: Seq[QDef] = Seq(

    // RIGHT OUTER join (§2.3): all customers kept, orders optional —
    // mirror of LEFT with sides swapped, preserving the null side.
    QDef("join_right_orders", (s, dir) => {
      import s.implicits._
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      ord.join(cust, $"o_custkey" === $"c_custkey", "right")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"), max($"o_totalprice").as("max_price"))
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, count(o_orderkey) AS n_orders, max(o_totalprice) AS max_price
      FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // INTERSECT ALL / EXCEPT ALL (§2.7): multiset semantics — nation
    // keys appear once per customer/supplier, duplicates preserved.
    QDef("setop_intersect_all", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").select(($"c_nationkey" % 5).as("k"))
      val sup = Tables(s, dir, "supplier").select(($"s_nationkey" % 5).as("k"))
      c.intersectAll(sup).groupBy($"k").agg(count(lit(1)).as("cnt")).orderBy($"k")
    }, Some("""
      SELECT k, count(*) AS cnt FROM (
        SELECT c_nationkey % 5 AS k FROM customer
        INTERSECT ALL SELECT s_nationkey % 5 AS k FROM supplier)
      GROUP BY k ORDER BY k""")),

    QDef("setop_except_all", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").select(($"c_nationkey" % 5).as("k"))
      val sup = Tables(s, dir, "supplier").select(($"s_nationkey" % 5).as("k"))
      c.exceptAll(sup).groupBy($"k").agg(count(lit(1)).as("cnt")).orderBy($"k")
    }, Some("""
      SELECT k, count(*) AS cnt FROM (
        SELECT c_nationkey % 5 AS k FROM customer
        EXCEPT ALL SELECT s_nationkey % 5 AS k FROM supplier)
      GROUP BY k ORDER BY k""")),

    // RANGE window frame (§2.5): value-based frame — all balances
    // within 100.0 below the current row's balance, per nation.
    QDef("window_range_frame", (s, dir) => {
      import s.implicits._
      // Double-valued RANGE offsets exist only in SQL form (the Scala
      // rangeBetween API is Long-only).
      Tables(s, dir, "customer")
        .selectExpr("c_custkey", "c_nationkey",
          """count(1) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
             RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS n_near""",
          """round(CAST(sum(CAST(c_acctbal AS DECIMAL(22,6))) OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal
             RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS near_sum""")
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_nationkey,
             count(*) OVER w AS n_near,
             round(CAST(sum(CAST(c_acctbal AS DECIMAL(22,6))) OVER w AS DOUBLE), 4) AS near_sum
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal
                   RANGE BETWEEN 100.0 PRECEDING AND CURRENT ROW)
      ORDER BY c_custkey""")),

    // GROUPS frame emulation (§2.5): neither Spark nor DuckDB 1.0
    // implements GROUPS — dense_rank + a RANGE frame over the rank
    // reproduces the semantics exactly (1 peer-group preceding); the
    // oracle mirrors the same rewrite.
    QDef("window_groups_frame", (s, dir) => {
      import s.implicits._
      val peers = Window.partitionBy($"l_returnflag").orderBy($"l_quantity")
      val groups = Window.partitionBy($"l_returnflag").orderBy($"dr")
        .rangeBetween(-1, 0)
      Tables(s, dir, "lineitem")
        .filter($"l_orderkey" % 500 === 0)
        .withColumn("dr", dense_rank().over(peers))
        .withColumn("grp_cnt", count(lit(1)).over(groups))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"grp_cnt").as("grp_cnt_sum"))
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(grp_cnt) AS BIGINT) AS grp_cnt_sum
      FROM (SELECT l_returnflag,
                   count(*) OVER (PARTITION BY l_returnflag ORDER BY dr
                                  RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS grp_cnt
            FROM (SELECT l_returnflag, l_quantity,
                         dense_rank() OVER (PARTITION BY l_returnflag
                                            ORDER BY l_quantity) AS dr
                  FROM lineitem WHERE l_orderkey % 500 = 0))
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // dictGet (§2.8 dictionary family): key→attribute lookup = LEFT
    // join against a broadcast dimension with a default for misses —
    // exactly how a ClickHouse dictionary behaves at query time.
    QDef("scalar_dictget", (s, dir) => {
      import s.implicits._
      val dict = broadcast(Tables(s, dir, "nation")
        .select($"n_nationkey", $"n_name"))
      Tables(s, dir, "customer")
        .withColumn("lookup_key", when($"c_custkey" % 10 === 0, lit(99))
          .otherwise($"c_nationkey"))
        .join(dict, $"lookup_key" === $"n_nationkey", "left")
        .withColumn("nation_name", coalesce($"n_name", lit("UNKNOWN")))
        .groupBy($"nation_name").agg(count(lit(1)).as("n"))
        .orderBy($"nation_name")
    }, Some("""
      SELECT coalesce(n_name, 'UNKNOWN') AS nation_name, count(*) AS n
      FROM (SELECT CASE WHEN c_custkey % 10 = 0 THEN 99 ELSE c_nationkey END AS lookup_key
            FROM customer) c
      LEFT JOIN nation ON lookup_key = n_nationkey
      GROUP BY nation_name ORDER BY nation_name""")),

    // -Array combinator family (§2.4): aggregates applied across array
    // elements — per-row fold (sequential, engine-identical), then
    // exact decimal aggregation across rows.
    QDef("agg_array_combinator", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "embeddings")
        .select($"label",
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE))")
            .cast("decimal(22,9)").as("row_sum"),
          expr("array_max(embedding)").cast("double").as("row_max"))
        .groupBy($"label")
        .agg(round(sum($"row_sum").cast("double"), 4).as("sum_array"),
          round(max($"row_max"), 4).as("max_array"),
          count(lit(1)).as("n"))
        .orderBy($"label")
    }, Some("""
      SELECT label,
             round(CAST(sum(row_sum) AS DOUBLE), 4) AS sum_array,
             round(max(row_max), 4) AS max_array,
             count(*) AS n
      FROM (SELECT label,
                   CAST(list_sum(list_transform(embedding, x -> x::DOUBLE))
                        AS DECIMAL(22,9)) AS row_sum,
                   list_max(embedding)::DOUBLE AS row_max
            FROM embeddings)
      GROUP BY label ORDER BY label""")),

    // Custom Generator (§2.10): streaming multi-column unnest —
    // shingle_rows(toks, 3) → (pos, shingle) rows inside GenerateExec.
    QDef("scalar_generator", (s, dir) => {
      import s.implicits._
      GraftFunctions.register(s)
      Tables(s, dir, "documents")
        .filter($"doc_id" % 100 === 0)
        .withColumn("toks", Text.tokens($"text"))
        .selectExpr("doc_id", "shingle_rows(toks, 3) AS (pos, shingle)")
        .orderBy($"doc_id", $"pos")
    }, Some("""
      SELECT doc_id,
             unnest(range(1, greatest(len(toks) - 1, 1))) - 1 AS pos,
             unnest(list_transform(range(1, greatest(len(toks) - 1, 1)),
                    i -> array_to_string(toks[i:i+2], ' '))) AS shingle
      FROM (SELECT doc_id, string_split(text, ' ') AS toks
            FROM documents WHERE doc_id % 100 = 0)
      ORDER BY doc_id, pos"""))
  )
}
