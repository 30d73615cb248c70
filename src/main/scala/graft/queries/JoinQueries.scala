package graft.queries

import graft.{Det, QDef, Tables}
import graft.ops.Joins
import org.apache.spark.sql.functions._

/** SURVEY.md §2.3: the ClickHouse join surface. Standard joins are
  * Spark builtins (Catalyst picks broadcast-hash vs sort-merge; dims
  * get explicit broadcast() hints so the 100 TB plan never shuffles a
  * 25-row nation table). ASOF and ANY joins come from [[graft.ops.Joins]].
  */
object JoinQueries {

  val defs: Seq[QDef] = Seq(

    // Star-schema inner join chain; all dims broadcast — at scale the
    // only shuffle is lineitem⋈orders (both large).
    QDef("join_star_revenue", (s, dir) => {
      import s.implicits._
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val nat = broadcast(Tables(s, dir, "nation"))
      val reg = broadcast(Tables(s, dir, "region"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(nat, $"c_nationkey" === $"n_nationkey")
        .join(reg, $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name")
        .agg(Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"r_name")
    }, Some(s"""
      SELECT r_name, ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name""")),

    // LEFT OUTER join preserving unmatched customers.
    QDef("join_left_orders", (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"),
          Det.dsum(coalesce($"o_totalprice", lit(0.0))).as("spent"))
        .orderBy($"c_custkey")
    }, Some(s"""
      SELECT c_custkey, count(o_orderkey) AS n_orders,
             ${Det.sqlSum("coalesce(o_totalprice, 0.0)")} AS spent
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")),

    // FULL OUTER join of two aggregates.
    QDef("join_full_nation", (s, dir) => {
      import s.implicits._
      val c = Tables(s, dir, "customer").groupBy($"c_nationkey".as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val p = Tables(s, dir, "supplier").groupBy($"s_nationkey".as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(p, $"ck" === $"sk", "full")
        .select(coalesce($"ck", $"sk").as("nationkey"), $"n_cust", $"n_supp")
        .orderBy($"nationkey")
    }, Some("""
      SELECT coalesce(ck, sk) AS nationkey, n_cust, n_supp
      FROM (SELECT c_nationkey AS ck, count(*) AS n_cust FROM customer GROUP BY 1) c
      FULL JOIN (SELECT s_nationkey AS sk, count(*) AS n_supp FROM supplier GROUP BY 1) s
        ON ck = sk
      ORDER BY nationkey""")),

    // LEFT SEMI: customers that have at least one high-priority order.
    QDef("join_semi", (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val urgent = Tables(s, dir, "orders").filter($"o_orderpriority" === "1-URGENT")
      cust.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name").orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""")),

    // LEFT ANTI: customers with no orders at all.
    QDef("join_anti", (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
      cust.join(ord, $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_nationkey").orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey""")),

    // CROSS JOIN (dims only — 5×25 rows at every SF).
    QDef("join_cross", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "region").crossJoin(Tables(s, dir, "nation"))
        .select($"r_name", $"n_name",
          ($"r_regionkey" === $"n_regionkey").as("is_home"))
        .orderBy($"r_name", $"n_name")
    }, Some("""
      SELECT r_name, n_name, r_regionkey = n_regionkey AS is_home
      FROM region CROSS JOIN nation ORDER BY r_name, n_name""")),

    // Theta (non-equi) join, band-bucketed: the range predicate spans
    // at most 5 units, so bucketing both sides by floor(acctbal/5) and
    // equi-joining on the bucket (supplier exploded to its two
    // reachable buckets) turns an O(n×m) nested loop into a hash join
    // + residual filter — the plan that survives a 100× scale-up.
    QDef("join_theta", (s, dir) => {
      import s.implicits._
      val sup = Tables(s, dir, "supplier")
        .withColumn("bucket", explode(array(
          floor($"s_acctbal" / 5) - 1, floor($"s_acctbal" / 5))))
      val cust = Tables(s, dir, "customer")
        .withColumn("bucket", floor($"c_acctbal" / 5))
      cust.join(broadcast(sup), Seq("bucket"))
        .filter($"c_acctbal" > $"s_acctbal" - 5 && $"c_acctbal" <= $"s_acctbal")
        .groupBy($"s_suppkey")
        .agg(count(lit(1)).as("n_close"), Det.dsum($"c_acctbal").as("bal_sum"))
        .orderBy($"s_suppkey")
    }, Some(s"""
      SELECT s_suppkey, count(*) AS n_close, ${Det.sqlSum("c_acctbal")} AS bal_sum
      FROM customer JOIN supplier
        ON c_acctbal > s_acctbal - 5 AND c_acctbal <= s_acctbal
      GROUP BY s_suppkey ORDER BY s_suppkey""")),

    // JOIN ... USING (coalesced key column). The naive form is a
    // many-to-many join on a 25-value key — output grows as
    // |customer|×|supplier|/25, quadratic with scale. The aggregates
    // are factorizable, so pre-aggregate EACH side per key and join 25
    // tiny rows instead: pairs = n_c·n_s and
    // sum(c+s over the cross) = n_s·sum_c + n_c·sum_s. Same result,
    // two partial aggs + a broadcast join — scale-flat. (The oracle
    // keeps the naive join: DuckDB's cost is irrelevant at sf0.01 and
    // it independently re-derives the semantics.)
    QDef("join_using", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val c = Tables(s, dir, "customer")
        .groupBy($"c_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_c"), sum($"c_acctbal".cast(D)).as("sum_c"))
      val sup = Tables(s, dir, "supplier")
        .groupBy($"s_nationkey".as("nationkey"))
        .agg(count(lit(1)).as("n_s"), sum($"s_acctbal".cast(D)).as("sum_s"))
      c.join(broadcast(sup), Seq("nationkey"))
        .select($"nationkey", ($"n_c" * $"n_s").as("pairs"),
          round(($"n_s" * $"sum_c" + $"n_c" * $"sum_s").cast("double"), 4).as("bal"))
        .orderBy($"nationkey")
    }, Some(s"""
      SELECT nationkey, count(*) AS pairs, ${Det.sqlSum("c_acctbal + s_acctbal")} AS bal
      FROM (SELECT c_nationkey AS nationkey, c_acctbal FROM customer) c
      JOIN (SELECT s_nationkey AS nationkey, s_acctbal FROM supplier) s USING (nationkey)
      GROUP BY nationkey ORDER BY nationkey""")),

    // ANY LEFT JOIN: each customer joined to exactly one order — the
    // most expensive one (deterministic tie-break on orderkey).
    QDef("join_any", (s, dir) => {
      import s.implicits._
      val cust = Tables(s, dir, "customer")
      val ord = Tables(s, dir, "orders")
        .select($"o_custkey".as("c_custkey"), $"o_orderkey", $"o_totalprice")
      Joins.anyJoin(cust, ord, Seq("c_custkey"),
          Seq($"o_totalprice".desc, $"o_orderkey".asc))
        .select($"c_custkey", $"o_orderkey".as("top_order"),
          $"o_totalprice".as("top_price"))
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, o_orderkey AS top_order, o_totalprice AS top_price
      FROM customer LEFT JOIN (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) o ON c_custkey = o_custkey AND rn = 1
      ORDER BY c_custkey""")),

    // ASOF JOIN: each error event → latest preceding purchase by the
    // same user (union+window implementation, one shuffle).
    QDef("join_asof", (s, dir) => {
      import s.implicits._
      val ev = Tables(s, dir, "events")
      val errors = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts", $"event_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("p_ts"), $"value".as("p_value"))
      Joins.asofJoin(errors, purchases, Seq("user_id"), "ts", "p_ts",
          Seq("p_ts", "p_value"))
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("err_us"),
          unix_micros($"asof_p_ts").as("purch_us"),
          $"asof_p_value".as("purch_value"))
        .orderBy($"user_id", $"err_us")
    }, Some("""
      SELECT l.user_id AS user_id, l.event_id AS event_id,
             epoch_us(CAST(l.ts AS TIMESTAMP)) AS err_us,
             epoch_us(CAST(r.ts AS TIMESTAMP)) AS purch_us,
             r.value AS purch_value
      FROM (SELECT * FROM events WHERE event_type = 'error') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY user_id, err_us"""))
  )
}
