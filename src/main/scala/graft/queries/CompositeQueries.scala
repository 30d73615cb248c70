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

    // Q6 shape (forecasting revenue change): pure single-pass scan —
    // every predicate pushes to the parquet reader, no join, one
    // partial/final agg over a 1-row group. The plan IS the filter
    // pushdown demonstrator at 100 TB: only (shipdate, discount,
    // quantity, extendedprice) columns are read.
    QDef("tpch_q6_forecast", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01" &&
          $"l_discount".between(0.04, 0.06) && $"l_quantity" < 24)
        .agg(Det.dsum($"l_extendedprice" * $"l_discount").as("revenue"))
    }, Some(s"""
      SELECT ${Det.sqlSum("l_extendedprice * l_discount")} AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""")),

    // Q12 shape (shipping-mode priority classes; fixture carries no
    // l_shipmode/commitdate/receiptdate, so l_linestatus stands in for
    // the group key and "shipped >30 days after ordering" for the
    // late-receipt predicate — same plan: big-big shuffle join on
    // orderkey, CASE-counted priority classes, tiny group-by).
    QDef("tpch_q12_priority", (s, dir) => {
      import s.implicits._
      val hi = $"o_orderpriority".isin("1-URGENT", "2-HIGH")
      val li = Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-01-01" && $"l_shipdate" < "1997-01-01")
        .select($"l_orderkey", $"l_linestatus", $"l_shipdate")
      Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        .join(li, $"o_orderkey" === $"l_orderkey")
        .filter($"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAY"))
        .groupBy($"l_linestatus")
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy($"l_linestatus")
    }, Some("""
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
      GROUP BY l_linestatus ORDER BY l_linestatus""")),

    // Q14 shape (promotion effect): one month of lineitem against the
    // broadcast part dim; promo share of revenue via conditional
    // decimal sums — a single 2-column ratio row.
    QDef("tpch_q14_promo", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val rev = $"l_extendedprice" * (lit(1.0) - $"l_discount")
      Tables(s, dir, "lineitem")
        .filter($"l_shipdate" >= "1996-09-01" && $"l_shipdate" < "1996-10-01")
        .join(broadcast(Tables(s, dir, "part").select($"p_partkey", $"p_type")),
          $"l_partkey" === $"p_partkey")
        .agg(round(lit(100.0) *
          sum(when($"p_type" === "PROMO", rev).otherwise(0.0).cast(D)).cast("double") /
          sum(rev.cast(D)).cast("double"), 4).as("promo_revenue"))
    }, Some("""
      SELECT round(100.0 *
               CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1.0 - l_discount)
                                  ELSE 0.0 END AS DECIMAL(22,6))) AS DOUBLE) /
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                             AS DECIMAL(22,6))) AS DOUBLE), 4) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-09-01'
        AND l_shipdate < TIMESTAMP '1996-10-01'""")),

    // Q19 shape (discounted revenue, disjunctive brand/size/quantity
    // ranges; p_container is absent so p_size ranges stand in): the
    // OR-of-conjunctions stays a post-join filter on a broadcast part
    // join — one lineitem pass, no shuffle.
    QDef("tpch_q19_discount", (s, dir) => {
      import s.implicits._
      val cond =
        ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
          $"l_quantity".between(1, 11)) ||
        ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
          $"l_quantity".between(10, 20)) ||
        ($"p_brand" === "Brand#34" && $"p_size".between(1, 35) &&
          $"l_quantity".between(20, 30))
      Tables(s, dir, "lineitem")
        .join(broadcast(Tables(s, dir, "part")
          .select($"p_partkey", $"p_brand", $"p_size")),
          $"l_partkey" === $"p_partkey")
        .filter(cond)
        .agg(Det.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue"))
    }, Some(s"""
      SELECT ${Det.sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 30)""")),

    // Q17 shape (small-quantity-order revenue): average yearly loss if
    // small orders (below 20% of the part's mean quantity) stopped.
    // The correlated scalar subquery DECORRELATES into a per-part
    // pre-aggregate joined back to the fact — the form that scales
    // (one extra shuffle on partkey instead of a per-row subquery).
    // The threshold avg comes from exact decimal sums so the filter
    // boundary is bit-identical on both engines.
    QDef("tpch_q17_small_qty", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val part = Tables(s, dir, "part")
        .filter($"p_brand".isin("Brand#11", "Brand#12", "Brand#13"))
        .select($"p_partkey")
      val th = Tables(s, dir, "lineitem")
        .groupBy($"l_partkey".as("t_partkey"))
        .agg((lit(0.2) * (sum($"l_quantity".cast(D)).cast("double") /
          count(lit(1)))).as("qty_threshold"))
      Tables(s, dir, "lineitem")
        .join(broadcast(part), $"l_partkey" === $"p_partkey")
        .join(th, $"l_partkey" === $"t_partkey")
        .filter($"l_quantity" < $"qty_threshold")
        .agg(round(sum($"l_extendedprice".cast(D)).cast("double") / 7.0, 4)
          .as("avg_yearly"))
    }, Some("""
      WITH th AS (SELECT l_partkey AS t_partkey,
                         0.2 * (CAST(sum(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE)
                                / count(*)) AS qty_threshold
                  FROM lineitem GROUP BY l_partkey)
      SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE)
                   / 7.0, 4) AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN th ON l_partkey = t_partkey
      WHERE p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
        AND l_quantity < qty_threshold""")),

    // Q18 shape (large-volume customers): orders whose total quantity
    // exceeds the threshold, with customer context — the HAVING
    // pre-filter runs as its own partial-agg shuffle BEFORE the joins,
    // so only qualifying orders (a tiny fraction) reach the 3-way
    // join; fused top-100.
    QDef("tpch_q18_large_orders", (s, dir) => {
      import s.implicits._
      val big = Tables(s, dir, "lineitem")
        .groupBy($"l_orderkey")
        .agg(Det.dsum($"l_quantity").as("total_qty"))
        .filter($"total_qty" > 150.0)
      val ord = Tables(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate")
      val cust = Tables(s, dir, "customer").select($"c_custkey", $"c_name")
      big.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
          $"total_qty")
        .orderBy($"total_qty".desc, $"o_orderkey")
        .limit(100)
    }, Some(s"""
      SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
      FROM (SELECT l_orderkey, ${Det.sqlSum("l_quantity")} AS total_qty
            FROM lineitem GROUP BY l_orderkey) big
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE total_qty > 150.0
      ORDER BY total_qty DESC, o_orderkey LIMIT 100""")),

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
      ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ---- ClickBench-style web-analytics shapes over `events` (the
    // reference's OTHER famous benchmark is exactly this workload:
    // hits/visits aggregations, daily trends, per-user depth
    // distributions, URL-parameter extraction) ----

    // top event types by hits + uniq users + mean value — the
    // "top referrers" shape: one scan, hash agg, fused top-k.
    QDef("cb_top_types", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("hits"),
          countDistinct($"user_id").as("uniq_users"),
          Det.davg($"value").as("mean_value"))
        .orderBy($"hits".desc, $"event_type")
        .limit(10)
    }, Some(s"""
      SELECT event_type, count(*) AS hits,
             count(DISTINCT user_id) AS uniq_users,
             ${Det.sqlAvg("value")} AS mean_value
      FROM events GROUP BY event_type
      ORDER BY hits DESC, event_type LIMIT 10""")),

    // daily PV/UV trend — the dashboard timeseries: day-truncated
    // scan, count + distinct per day (two-phase: partial counts
    // merge; the distinct forces the usual expand).
    QDef("cb_daily_pv_uv", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
        .agg(count(lit(1)).as("pv"), countDistinct($"user_id").as("uv"))
        .orderBy($"day")
    }, Some("""
      SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
             count(*) AS pv, count(DISTINCT user_id) AS uv
      FROM events GROUP BY day ORDER BY day""")),

    // per-user engagement-depth distribution — the two-level
    // aggregation shape (events per user, then users per depth).
    QDef("cb_user_depth", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
        .groupBy($"n_events").agg(count(lit(1)).as("n_users"))
        .orderBy($"n_events")
    }, Some("""
      SELECT n_events, count(*) AS n_users
      FROM (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
      GROUP BY n_events ORDER BY n_events""")),

    // JSON-parameter bucketing — CB's URL-parameter extraction shape:
    // per-row JSON path extract feeding a hash agg, all codegen.
    QDef("cb_json_param", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .select((get_json_object($"props", "$.k").cast("int") % 10).as("k_bucket"))
        .groupBy($"k_bucket").agg(count(lit(1)).as("hits"))
        .orderBy($"k_bucket")
    }, Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
             count(*) AS hits
      FROM events GROUP BY k_bucket ORDER BY k_bucket""")),

    // minutely error trend — CB's "per-minute hits over a window"
    // shape: a pushed-down type filter feeding a truncated-timestamp
    // hash agg; the filter reaches the parquet scan so the agg only
    // sees the error stripe.
    QDef("cb_minutely_errors", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .filter($"event_type" === "error")
        .groupBy(unix_micros(date_trunc("minute", $"ts")).as("minute_us"))
        .agg(count(lit(1)).as("errors"), Det.dsum($"value").as("err_value"))
        .filter($"errors" >= 2)
        .orderBy($"minute_us")
    }, Some(s"""
      SELECT epoch_us(date_trunc('minute', CAST(ts AS TIMESTAMP))) AS minute_us,
             count(*) AS errors, ${Det.sqlSum("value")} AS err_value
      FROM events WHERE event_type = 'error'
      GROUP BY minute_us HAVING count(*) >= 2 ORDER BY minute_us""")),

    // top users by hits — CB's "GROUP BY UserID ORDER BY c DESC
    // LIMIT 10" on the high-cardinality key: partial counts merge,
    // then the fused TakeOrderedAndProject top-k (no global sort).
    QDef("cb_top_users", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("hits"), Det.davg($"value").as("mean_value"),
          countDistinct($"event_type").as("n_types"))
        .orderBy($"hits".desc, $"user_id")
        .limit(10)
    }, Some(s"""
      SELECT user_id, count(*) AS hits, ${Det.sqlAvg("value")} AS mean_value,
             count(DISTINCT event_type) AS n_types
      FROM events GROUP BY user_id
      ORDER BY hits DESC, user_id LIMIT 10""")),

    // substring search scan — CB's "WHERE URL LIKE '%google%'" shape:
    // LIKE over the props payload, count + uniq users, single scan.
    QDef("cb_filter_like", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .filter($"props".like("%\"k\": 9%"))
        .agg(count(lit(1)).as("hits"), countDistinct($"user_id").as("uniq_users"),
          min($"event_id").as("first_event"))
    }, Some("""
      SELECT count(*) AS hits, count(DISTINCT user_id) AS uniq_users,
             min(event_id) AS first_event
      FROM events WHERE props LIKE '%"k": 9%'""")),

    // hour-of-day engagement profile — pure codegen extract + agg
    // (CB's "by hour" dashboards): no shuffle beyond the 24-key agg.
    QDef("cb_hourly_profile", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy(hour($"ts").cast("long").as("hr"))
        .agg(count(lit(1)).as("pv"), countDistinct($"user_id").as("uv"),
          Det.davg($"value").as("mean_value"))
        .orderBy($"hr")
    }, Some(s"""
      SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr, count(*) AS pv,
             count(DISTINCT user_id) AS uv, ${Det.sqlAvg("value")} AS mean_value
      FROM events GROUP BY hr ORDER BY hr""")),

    // per-type latency-style exact quantiles — CH's quantiles(...)
    // multi-q shape (exact, not sketched, so the oracle hash-matches;
    // the sketched path is ApproxSpec territory).
    QDef("cb_value_quantiles", (s, dir) => {
      import s.implicits._
      // primitive-vector quantile state (identical interpolation to
      // the builtin; ~3× faster on this shape — see agg_quantiles)
      graft.functions.GraftFunctions.register(s)
      Tables(s, dir, "events")
        .groupBy($"event_type")
        .agg(expr("""array_join(transform(
                       graft_quantile_exact(CAST(value AS DOUBLE),
                                            array(0.5D, 0.9D, 0.99D)),
                       q -> CAST(round(q, 4) AS STRING)), ',')""").as("value_q"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type,
             array_to_string(list_transform(quantile_cont(value, [0.5, 0.9, 0.99]),
                             q -> CAST(round(q, 4) AS VARCHAR)), ',') AS value_q
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // first/last event per user cohort — CB's visit bracketing
    // (argMin/argMax by timestamp) over a modulo cohort key.
    QDef("cb_first_last", (s, dir) => {
      import s.implicits._
      // Tie-break without BIGINT overflow: fixed-width zero-padded
      // (ts µs, event_id) strings compare lexicographically = numerically
      // (DuckDB arg_min can't order by a struct — CLAUDE.md trap).
      val key = concat(lpad(unix_micros($"ts").cast("string"), 20, "0"),
        lpad($"event_id".cast("string"), 10, "0"))
      Tables(s, dir, "events")
        .groupBy(($"user_id" % 10).as("cohort"))
        .agg(min_by($"event_type", key).as("first_type"),
          max_by($"event_type", key).as("last_type"),
          (unix_micros(max($"ts")) - unix_micros(min($"ts"))).as("span_us"))
        .orderBy($"cohort")
    }, Some("""
      WITH e AS (
        SELECT user_id, event_type, ts,
               lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
                 || lpad(CAST(event_id AS VARCHAR), 10, '0') AS tkey
        FROM events)
      SELECT user_id % 10 AS cohort,
             arg_min(event_type, tkey) AS first_type,
             arg_max(event_type, tkey) AS last_type,
             epoch_us(CAST(max(ts) AS TIMESTAMP))
               - epoch_us(CAST(min(ts) AS TIMESTAMP)) AS span_us
      FROM e GROUP BY cohort ORDER BY cohort""")),

    // gap-rule sessionization — the canonical web-analytics batch
    // shape ClickHouse users run daily: a 30-minute inactivity gap
    // opens a new session (lag + running sum over the per-user
    // window — partitioned by user, never global), then exact
    // integer session stats. (event_id breaks ts ties so the lag
    // order is total; all outputs are integer sums — no FP.)
    QDef("cb_sessionize", (s, dir) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"us", $"event_id")
      val gap = ($"us" - lag($"us", 1).over(w)) > 1800000000L
      val sess = Tables(s, dir, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
        .withColumn("new_s", when(gap.isNull || gap, 1).otherwise(0))
        .withColumn("sid", sum($"new_s").over(
          org.apache.spark.sql.expressions.Window
            .partitionBy($"user_id").orderBy($"us", $"event_id")
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy($"user_id", $"sid")
        .agg(count(lit(1)).as("n_ev"), (max($"us") - min($"us")).as("dur_us"))
      sess.agg(count(lit(1)).as("n_sessions"),
        sum($"n_ev").as("n_events"),
        sum($"dur_us").as("total_dur_us"),
        max($"n_ev").as("busiest_session"))
    }, Some("""
      WITH e AS (SELECT user_id, event_id,
                        epoch_us(CAST(ts AS TIMESTAMP)) AS us
                 FROM events),
      marked AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER (PARTITION BY user_id
                                            ORDER BY us, event_id)
                         > 1800000000 THEN 1
                    WHEN lag(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id) IS NULL THEN 1
                    ELSE 0 END AS new_s,
               event_id
        FROM e),
      sess AS (
        SELECT user_id,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid,
               us
        FROM marked),
      stats AS (
        SELECT user_id, sid, count(*) AS n_ev, max(us) - min(us) AS dur_us
        FROM sess GROUP BY user_id, sid)
      SELECT CAST(count(*) AS BIGINT) AS n_sessions,
             CAST(sum(n_ev) AS BIGINT) AS n_events,
             CAST(sum(dur_us) AS BIGINT) AS total_dur_us,
             CAST(max(n_ev) AS BIGINT) AS busiest_session
      FROM stats""")),

    // week-over-week returning users — cohort retention over the
    // DISTINCT (user, week) table (small: users × weeks), self-joined
    // one week forward. The distinct collapses the fact table before
    // any join, CH's recommended shape for retention dashboards.
    QDef("cb_week_retention", (s, dir) => {
      import s.implicits._
      val weeks = Tables(s, dir, "events")
        .select($"user_id", trunc($"ts".cast("date"), "week").as("wk"))
        .distinct()
      weeks.as("a")
        .join(weeks.as("b"),
          $"a.user_id" === $"b.user_id" &&
            $"b.wk" === date_add($"a.wk", 7))
        .groupBy($"a.wk".as("week"))
        .agg(count(lit(1)).as("returning_users"))
        .orderBy($"week")
    }, Some("""
      WITH weeks AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS wk
        FROM events)
      SELECT a.wk AS week, count(*) AS returning_users
      FROM weeks a JOIN weeks b
        ON b.user_id = a.user_id AND b.wk = a.wk + 7
      GROUP BY a.wk ORDER BY a.wk"""))
  )
}
