package graft.queries

import graft.{Graft, QDef, Tables}

/** Clause-level CH SQL front door (SURVEY §2.6/§2.1/§2.4 syntax):
  * each entry feeds a VERBATIM ClickHouse query string through
  * [[graft.Graft.sql]] — `LIMIT n BY`, `ORDER BY … WITH FILL FROM/TO/
  * STEP`, `SAMPLE f`, `GROUP BY … WITH TOTALS`, and all of them
  * combined — and hash-matches a DuckDB oracle. The routing itself
  * ([[graft.ChSql]]) only rearranges strings on the driver; the
  * executed plans are the proven operators' plans (partial/final
  * limit-by, broadcast series fill join, hash-threshold scan
  * predicate, grouping sets), so these entries prove TEXT-level
  * compatibility on top of the operator-level rows already graded.
  */
object ChSqlQueries {

  val defs: Seq[QDef] = Seq(

    // LIMIT n BY k — CH applies it after ORDER BY; the routing lands
    // on LimitByPlan.limitBy (map-side bounded-heap pruning below the
    // exchange). Same oracle as rel_limit_by_exec's window form.
    QDef("sql_ch_limit_by", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT p_brand, p_partkey, p_retailprice
        FROM part
        ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC
        LIMIT 2 BY p_brand""")
    }, Some("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
      WHERE rn <= 2
      ORDER BY p_brand, p_retailprice DESC, p_partkey""")),

    // ORDER BY x WITH FILL FROM a TO b STEP s on a numeric axis —
    // routed to Relational.withFillStep; unmentioned columns take
    // their type default (0 for the count), CH's default-value fill.
    QDef("sql_ch_with_fill", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_quantity, count(*) AS n
        FROM lineitem
        WHERE l_orderkey % 97 = 0
        GROUP BY l_quantity
        ORDER BY l_quantity ASC WITH FILL FROM 1 TO 51 STEP 1""")
    }, Some("""
      WITH data AS (SELECT l_quantity, count(*) AS n
                    FROM lineitem WHERE l_orderkey % 97 = 0
                    GROUP BY l_quantity),
      grid AS (SELECT CAST(unnest(generate_series(1, 50, 1)) AS DOUBLE) AS l_quantity)
      SELECT l_quantity, n FROM data
      UNION ALL
      SELECT g.l_quantity, CAST(0 AS BIGINT) AS n FROM grid g
      WHERE NOT EXISTS (SELECT 1 FROM data d WHERE d.l_quantity = g.l_quantity)
      ORDER BY l_quantity""")),

    // FROM t SAMPLE 0.1 — rewritten to the deterministic mh60
    // threshold predicate on the table's sampling key (pushed to the
    // scan), bit-identical to rel_sample_hash's contract. min/max/
    // count aggregates keep the result FP-order independent.
    QDef("sql_ch_sample", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_returnflag, count(*) AS n_sampled,
               min(l_quantity) AS q_min, max(l_quantity) AS q_max
        FROM lineitem SAMPLE 0.1
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag, count(*) AS n_sampled,
             min(l_quantity) AS q_min, max(l_quantity) AS q_max
      FROM lineitem
      WHERE CAST('0x' || substring(md5('smp|' || l_orderkey), 1, 15) AS BIGINT)
              % 1000000 < 100000
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // GROUP BY … WITH TOTALS — rewritten to GROUPING SETS ((k), ()):
    // per-group rows plus one all-NULL-keys grand-total row (the
    // relational form of CH's totals side block).
    QDef("sql_ch_totals", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT o_orderstatus, count(*) AS cnt,
               min(o_totalprice) AS lo, max(o_totalprice) AS hi
        FROM orders
        GROUP BY o_orderstatus WITH TOTALS
        ORDER BY o_orderstatus""")
    }, Some("""
      SELECT o_orderstatus, count(*) AS cnt,
             min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus), ())
      ORDER BY o_orderstatus ASC NULLS FIRST""")),

    // All clauses in ONE verbatim CH query: SAMPLE + GROUP BY +
    // ORDER BY + LIMIT BY + final LIMIT, exercising the full peel
    // order (LIMIT m, then LIMIT n BY, then ORDER BY) and proving the
    // clauses compose the way CH executes them.
    QDef("sql_ch_combo", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_quantity, l_returnflag, count(*) AS n
        FROM lineitem SAMPLE 0.5
        GROUP BY l_quantity, l_returnflag
        ORDER BY l_quantity ASC, l_returnflag ASC
        LIMIT 2 BY l_quantity
        LIMIT 30""")
    }, Some("""
      WITH smp AS (SELECT * FROM lineitem
                   WHERE CAST('0x' || substring(md5('smp|' || l_orderkey), 1, 15) AS BIGINT)
                           % 1000000 < 500000),
      agg AS (SELECT l_quantity, l_returnflag, count(*) AS n
              FROM smp GROUP BY l_quantity, l_returnflag),
      lb AS (SELECT *, row_number() OVER (PARTITION BY l_quantity
                                          ORDER BY l_returnflag) AS rn
             FROM agg)
      SELECT l_quantity, l_returnflag, n FROM lb WHERE rn <= 2
      ORDER BY l_quantity, l_returnflag LIMIT 30""")),

    // CH offset spellings: LIMIT o, n BY k (skip o rows per group —
    // window route) and the trailing comma limit LIMIT o, n
    // (→ offset+limit). Both offsets exercised in one verbatim query.
    QDef("sql_ch_limit_offset", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT p_brand, p_partkey, p_retailprice
        FROM part
        ORDER BY p_brand ASC, p_retailprice DESC, p_partkey ASC
        LIMIT 1, 2 BY p_brand
        LIMIT 5, 10""")
    }, Some("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
      WHERE rn > 1 AND rn <= 3
      ORDER BY p_brand, p_retailprice DESC, p_partkey
      LIMIT 10 OFFSET 5""")),

    // WITH FILL + INTERPOLATE: inserted grid rows carry the previous
    // count forward (LOCF over the bounded filled series) instead of
    // the type default. Grid points before the first data row stay
    // NULL on both engines.
    QDef("sql_ch_fill_interpolate", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_quantity, count(*) AS n
        FROM lineitem
        WHERE l_orderkey % 97 = 0 AND l_quantity >= 5
        GROUP BY l_quantity
        ORDER BY l_quantity ASC WITH FILL FROM 1 TO 51 STEP 1 INTERPOLATE (n)""")
    }, Some("""
      WITH data AS (SELECT l_quantity, count(*) AS n
                    FROM lineitem WHERE l_orderkey % 97 = 0 AND l_quantity >= 5
                    GROUP BY l_quantity),
      grid AS (SELECT CAST(unnest(generate_series(1, 50, 1)) AS DOUBLE) AS l_quantity),
      filled AS (
        SELECT l_quantity, n FROM data
        UNION ALL
        SELECT g.l_quantity, NULL AS n FROM grid g
        WHERE NOT EXISTS (SELECT 1 FROM data d WHERE d.l_quantity = g.l_quantity))
      SELECT l_quantity,
             last_value(n IGNORE NULLS) OVER (ORDER BY l_quantity
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
      FROM filled ORDER BY l_quantity""")),

    // ARRAY JOIN — CH's explode clause, rewritten to LATERAL VIEW
    // explode; the array expression itself is CH-spelled
    // (splitByChar resolves through the dialect registry).
    QDef("sql_ch_array_join", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT doc_id, tok
        FROM documents
        ARRAY JOIN splitByChar(' ', text) AS tok
        WHERE doc_id < 5 AND tok != ''
        ORDER BY doc_id, tok""")
    }, Some("""
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE doc_id < 5)
      WHERE tok != ''
      ORDER BY doc_id, tok""")),

    // PREWHERE — CH's early-filter clause; Spark's scan pushdown IS
    // that optimization, so it folds into WHERE (conjunction when both
    // appear). GLOBAL/ALL join modifiers strip (the planner owns
    // distribution), and a trailing FORMAT clause is dropped.
    QDef("sql_ch_prewhere", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        GLOBAL ALL INNER JOIN orders ON l_orderkey = o_orderkey
        PREWHERE l_quantity > 45
        WHERE o_orderpriority = '1-URGENT'
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        FORMAT JSONEachRow""")
    }, Some("""
      SELECT l_returnflag, count(*) AS n
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_quantity > 45 AND o_orderpriority = '1-URGENT'
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // CH scalar WITH: constant and scalar-subquery aliases usable
    // anywhere in the query (not CTEs — those pass through to
    // Spark's native WITH untouched). Plus positional GROUP BY/
    // ORDER BY ordinals.
    QDef("sql_ch_scalar_with", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        WITH 25 AS qty_cut,
             (SELECT max(o_totalprice) FROM orders) AS price_max
        SELECT l_returnflag, count(*) AS n,
               round(max(l_extendedprice) / price_max, 6) AS price_ratio
        FROM lineitem
        WHERE l_quantity > qty_cut
        GROUP BY 1
        ORDER BY 1""")
    }, Some("""
      SELECT l_returnflag, count(*) AS n,
             round(max(l_extendedprice) /
                   (SELECT max(o_totalprice) FROM orders), 6) AS price_ratio
      FROM lineitem WHERE l_quantity > 25
      GROUP BY 1 ORDER BY 1""")),

    // Verbatim CH ASOF LEFT JOIN text → ops/Joins.asofJoin (the
    // union+window one-shuffle operator); DuckDB's native ASOF JOIN
    // is the oracle. Timestamps compared in epoch-µs (the events ns/µs
    // trap, FIXTURES.md).
    QDef("sql_ch_asof_join", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l.user_id, l.event_id,
               unix_micros(l.ts) AS err_us,
               unix_micros(r.ts) AS purch_us,
               r.value AS purch_value
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        ORDER BY user_id, err_us""")
    }, Some("""
      SELECT l.user_id AS user_id, l.event_id AS event_id,
             epoch_us(CAST(l.ts AS TIMESTAMP)) AS err_us,
             epoch_us(CAST(r.ts AS TIMESTAMP)) AS purch_us,
             r.value AS purch_value
      FROM (SELECT * FROM events WHERE event_type = 'error') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
      ORDER BY user_id, err_us""")),

    // ASOF with the inequality REVERSED (l.ts <= r.ts): for each error
    // the EARLIEST purchase at-or-after it — the "next action after a
    // failure" shape. Same union+window operator, forward scan; the
    // oracle is DuckDB's native ASOF with the same inequality.
    QDef("sql_ch_asof_rev", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l.user_id, l.event_id,
               unix_micros(l.ts) AS err_us,
               unix_micros(r.ts) AS next_purch_us,
               r.value AS purch_value
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                        WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts <= r.ts
        ORDER BY user_id, err_us""")
    }, Some("""
      SELECT l.user_id AS user_id, l.event_id AS event_id,
             epoch_us(CAST(l.ts AS TIMESTAMP)) AS err_us,
             epoch_us(CAST(r.ts AS TIMESTAMP)) AS next_purch_us,
             r.value AS purch_value
      FROM (SELECT * FROM events WHERE event_type = 'error') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts <= r.ts
      ORDER BY user_id, err_us""")),

    // ASOF strict (l.ts > r.ts): latest purchase STRICTLY before each
    // error — an exact-ts purchase must NOT match. DuckDB native ASOF
    // with > is the oracle.
    QDef("sql_ch_asof_strict", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l.user_id, l.event_id,
               unix_micros(l.ts) AS err_us,
               unix_micros(r.ts) AS prev_purch_us
        FROM (SELECT user_id, ts, event_id FROM events
              WHERE event_type = 'error') l
        ASOF LEFT JOIN (SELECT user_id, ts FROM events
                        WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts > r.ts
        ORDER BY user_id, err_us""")
    }, Some("""
      SELECT l.user_id AS user_id, l.event_id AS event_id,
             epoch_us(CAST(l.ts AS TIMESTAMP)) AS err_us,
             epoch_us(CAST(r.ts AS TIMESTAMP)) AS prev_purch_us
      FROM (SELECT * FROM events WHERE event_type = 'error') l
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') r
        ON l.user_id = r.user_id AND l.ts > r.ts
      ORDER BY user_id, err_us""")),

    // Verbatim CH LEFT ANY JOIN text → ops/Joins.anyJoin (right side
    // deduped to one row per key BEFORE the join — broadcastable).
    // CH picks an arbitrary match; the router pins first-by-remaining-
    // right-columns, mirrored in the oracle's row_number ordering.
    QDef("sql_ch_any_join", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT c.c_custkey, o.o_orderkey AS first_order,
               o.o_totalprice AS first_price
        FROM customer c
        LEFT ANY JOIN (SELECT o_custkey, o_orderkey, o_totalprice
                       FROM orders) o
          ON c.c_custkey = o.o_custkey
        ORDER BY c_custkey""")
    }, Some("""
      SELECT c_custkey, o_orderkey AS first_order, o_totalprice AS first_price
      FROM customer LEFT JOIN (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderkey, o_totalprice) AS rn
        FROM orders) o ON c_custkey = o_custkey AND rn = 1
      ORDER BY c_custkey""")),

    // CH `CREATE FUNCTION f AS (args) -> body` (the SQL-lambda UDF,
    // §2.10a) through the front door: registered as a parse-once
    // macro, so every call site expands to builtin codegen'd
    // expressions — zero UDF overhead at any scale. The oracle inlines
    // the same body.
    QDef("sql_ch_create_function", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s,
        "CREATE FUNCTION disc_price AS (p, d) -> CAST(p * (1.0 - d) AS DECIMAL(22,6))")
      Graft.sql(s, """
        SELECT l_returnflag,
               round(CAST(sum(disc_price(l_extendedprice, l_discount)) AS DOUBLE), 4)
                 AS revenue
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag,
             round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                                 AS DECIMAL(22,6))) AS DOUBLE), 4) AS revenue
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // IPv4 family as CH spellings (dotted-quad codec + /16 CIDR
    // range), all codegen'd shift/mask macros; the oracle spells the
    // same arithmetic in DuckDB. IPs synthesized from orderkey (the
    // scalar_bits_ip scheme — fixtures carry no address column).
    QDef("sql_ch_ipv4", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT o_orderkey,
               IPv4NumToString(ip) AS dotted,
               IPv4StringToNum(IPv4NumToString(ip)) AS roundtrip,
               isIPv4String(IPv4NumToString(ip)) AS valid,
               IPv4CIDRToRange(ip, 20).lo AS cidr_lo,
               IPv4CIDRToRange(ip, 20).hi AS cidr_hi
        FROM (SELECT o_orderkey, (o_orderkey * 2654435761) % 4294967296 AS ip
              FROM orders WHERE o_orderkey % 101 = 0)
        ORDER BY o_orderkey""")
    }, Some("""
      WITH src AS (SELECT o_orderkey,
                          (o_orderkey * 2654435761) % 4294967296 AS ip
                   FROM orders WHERE o_orderkey % 101 = 0),
      d AS (SELECT o_orderkey, ip,
                   concat_ws('.', (ip >> 24) & 255, (ip >> 16) & 255,
                                  (ip >> 8) & 255, ip & 255) AS dotted,
                   ip & (4294967295 - 4095) AS lo_num,
                   ip | 4095 AS hi_num
            FROM src)
      SELECT o_orderkey, dotted,
             CAST(ip AS BIGINT) AS roundtrip,
             true AS valid,
             concat_ws('.', (lo_num >> 24) & 255, (lo_num >> 16) & 255,
                            (lo_num >> 8) & 255, lo_num & 255) AS cidr_lo,
             concat_ws('.', (hi_num >> 24) & 255, (hi_num >> 16) & 255,
                            (hi_num >> 8) & 255, hi_num & 255) AS cidr_hi
      FROM d ORDER BY o_orderkey""")),

    // ORDER BY … WITH FILL STEP INTERVAL 1 HOUR — the time-axis fill
    // form (Relational.withFillInterval: grid = data's own min→max at
    // the stride, broadcast; unmentioned count fills with 0). Sparse
    // error events leave real hour gaps to fill. The µs/ns events.ts
    // trap makes the compare run on epoch-µs.
    QDef("sql_ch_fill_interval", (s, dir) => {
      import org.apache.spark.sql.functions.{col, unix_micros}
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT toStartOfHour(ts) AS hr, count(*) AS n
        FROM events
        WHERE event_type = 'error'
        GROUP BY 1
        ORDER BY hr ASC WITH FILL STEP INTERVAL 1 HOUR""")
        .select(unix_micros(col("hr")).as("hr_us"), col("n"))
        .orderBy(col("hr_us"))
    }, Some("""
      WITH data AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
                           count(*) AS n
                    FROM events WHERE event_type = 'error' GROUP BY 1),
      grid AS (SELECT unnest(generate_series((SELECT min(hr) FROM data),
                                             (SELECT max(hr) FROM data),
                                             INTERVAL 1 HOUR)) AS hr)
      SELECT epoch_us(g.hr) AS hr_us, CAST(coalesce(d.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN data d USING (hr)
      ORDER BY hr_us""")),

    // CH introspection surface as verbatim text: the numbers(N) table
    // function (→ Spark's lazy, split-able range() TVF), system.one
    // (scalar subquery), and — spec-covered, environment-specific —
    // system.tables. The agg over numbers stays a parallel range scan
    // with partial aggregation; nothing materializes 100k rows.
    QDef("sql_ch_system", (s, dir) => {
      Graft.sql(s, """
        SELECT number % 7 AS bucket, count(*) AS n,
               CAST(sum(number) AS BIGINT) AS total,
               (SELECT dummy FROM system.one) AS dummy
        FROM numbers(100000)
        GROUP BY bucket ORDER BY bucket""")
    }, Some("""
      SELECT range % 7 AS bucket, count(*) AS n,
             CAST(sum(range) AS BIGINT) AS total,
             CAST(0 AS TINYINT) AS dummy
      FROM range(100000) GROUP BY bucket ORDER BY bucket""")),

    // Named WINDOW clause + CH's TOP n spelling, as verbatim text:
    // one window definition shared by two functions (Spark owns the
    // WINDOW clause; TOP rewrites to LIMIT in the front door). Total
    // ORDER BY inside the window keeps the running count exact.
    QDef("sql_ch_named_window", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT TOP 40 o_orderkey, o_orderstatus,
               rank() OVER w AS rnk,
               CAST(count(*) OVER w AS BIGINT) AS running
        FROM orders WHERE o_orderkey % 50 = 0
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice DESC, o_orderkey)
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
             rank() OVER w AS rnk,
             count(*) OVER w AS running
      FROM orders WHERE o_orderkey % 50 = 0
      WINDOW w AS (PARTITION BY o_orderstatus
                   ORDER BY o_totalprice DESC, o_orderkey)
      ORDER BY o_orderkey LIMIT 40""")),

    // Star modifiers as verbatim CH text: * REPLACE rewrites one
    // column in place, COLUMNS('re') selects by name regex (both
    // expanded against the FROM table's schema in the front door;
    // * EXCEPT is Spark-native). DuckDB speaks the same modifiers,
    // so the oracle is nearly the identical query.
    QDef("sql_ch_star_mods", (s, dir) => {
      graft.Graft.init(s, dir)
      val a = graft.Graft.sql(s, """
        SELECT * REPLACE (upper(n_name) AS n_name) FROM nation
        WHERE n_nationkey < 10 ORDER BY n_nationkey""")
      val b = graft.Graft.sql(s, """
        SELECT COLUMNS('n_.*key') FROM nation
        WHERE n_name = 'NATION_7'""")
      a.crossJoin(org.apache.spark.sql.functions.broadcast(
        b.withColumnRenamed("n_nationkey", "ref_key")
          .withColumnRenamed("n_regionkey", "ref_region")))
        .orderBy("n_nationkey")
    }, Some("""
      SELECT * FROM
        (SELECT * REPLACE (upper(n_name) AS n_name) FROM nation
         WHERE n_nationkey < 10),
        (SELECT n_nationkey AS ref_key, n_regionkey AS ref_region
         FROM nation WHERE n_name = 'NATION_7')
      ORDER BY n_nationkey""")),

    // Parametric-aggregate call syntax `f(params)(args)` as verbatim
    // CH text: quantile[s][Exact](p…) → percentile, uniqUpTo(n) →
    // capped count(DISTINCT). Round-4 on interpolated quantiles, the
    // same FP-dust guard agg_quantiles carries.
    QDef("sql_ch_parametric", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT o_orderpriority,
               round(quantileExact(0.5)(o_totalprice), 4) AS med_price,
               round(arrayElement(quantiles(0.25, 0.75)(o_totalprice), 2), 4) AS p75,
               uniqUpTo(10)(o_orderstatus) AS status_upto
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }, Some("""
      SELECT o_orderpriority,
             round(quantile_cont(o_totalprice, 0.5), 4) AS med_price,
             round(quantile_cont(o_totalprice, 0.75), 4) AS p75,
             least(count(DISTINCT o_orderstatus), CAST(11 AS BIGINT)) AS status_upto
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // topK(k)(x) / topKWeighted(k)(x, w) through the parametric
    // rewrite: an on-demand UDAF over the SpaceSaving Aggregator.
    // orders has 5 priorities / lineitem 3 return flags — well under
    // the sketch capacity, so the result is EXACT and the groupBy/
    // count oracle applies (same contract as funnel_topk). Arrays
    // join to strings so both engines hash identical scalars; the
    // weighted form weighs by per-row quantity cast to BIGINT on
    // both sides (l_quantity is integral in the fixture).
    QDef("sql_ch_topk", (s, dir) => {
      graft.Graft.init(s, dir)
      val a = graft.Graft.sql(s, """
        SELECT arrayStringConcat(topK(3)(o_orderpriority), ',') AS top_prios
        FROM orders""")
      val b = graft.Graft.sql(s, """
        SELECT arrayStringConcat(topKWeighted(2)(l_returnflag, l_quantity), ',') AS top_flags
        FROM lineitem""")
      a.crossJoin(org.apache.spark.sql.functions.broadcast(b))
    }, Some("""
      SELECT (SELECT string_agg(o_orderpriority, ',' ORDER BY c DESC, o_orderpriority)
              FROM (SELECT o_orderpriority, count(*) AS c FROM orders GROUP BY 1
                    ORDER BY c DESC, o_orderpriority LIMIT 3)) AS top_prios,
             (SELECT string_agg(l_returnflag, ',' ORDER BY w DESC, l_returnflag)
              FROM (SELECT l_returnflag, sum(CAST(l_quantity AS BIGINT)) AS w
                    FROM lineitem GROUP BY 1
                    ORDER BY w DESC, l_returnflag LIMIT 2)) AS top_flags""")),

    // windowFunnel(window)(ts, cond…) as verbatim CH text (7-day
    // window in SECONDS on the timestamp column, CH's DateTime
    // convention) — routed onto the proven WindowFunnel Aggregator
    // through the CondsAdapter UDAF. Same exists-chain oracle as
    // funnel_window, aggregated to depth counts; the universe is ALL
    // users (unmatched users report depth 0).
    QDef("sql_ch_funnel_text", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT depth, count(*) AS users FROM (
          SELECT user_id,
                 windowFunnel(604800)(ts, event_type = 'view',
                   event_type = 'click', event_type = 'purchase') AS depth
          FROM events
          GROUP BY user_id)
        GROUP BY depth
        ORDER BY depth""")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                 FROM events),
      v AS (SELECT user_id, us FROM e WHERE event_type = 'view'),
      c AS (SELECT user_id, us FROM e WHERE event_type = 'click'),
      p AS (SELECT user_id, us FROM e WHERE event_type = 'purchase'),
      d1 AS (SELECT DISTINCT user_id FROM v),
      d2 AS (SELECT DISTINCT v.user_id FROM v JOIN c ON c.user_id = v.user_id
             AND c.us >= v.us AND c.us - v.us <= 604800000000),
      d3 AS (SELECT DISTINCT v.user_id FROM v
             JOIN c ON c.user_id = v.user_id AND c.us >= v.us
             JOIN p ON p.user_id = v.user_id AND p.us >= c.us
             AND p.us - v.us <= 604800000000),
      per AS (SELECT u.user_id,
                     CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
                          WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
                          WHEN u.user_id IN (SELECT user_id FROM d1) THEN 1
                          ELSE 0 END AS depth
              FROM (SELECT DISTINCT user_id FROM e) u)
      SELECT depth, count(*) AS users FROM per
      GROUP BY depth ORDER BY depth""")),

    // sequenceMatch('pattern')(ts, cond…) as verbatim CH text — the
    // pattern-DSL parser (SeqPattern) + CondsAdapter behind the
    // parametric rewrite. Timed-adjacent and skip forms, counted over
    // users; same exists-chain + NOT-EXISTS-betweenness oracle as
    // funnel_sequence_pattern (betweenness is over events matching a
    // DECLARED condition — CH's no-skip rule).
    QDef("sql_ch_seq_text", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT countIf(m1) AS n_adjacent, countIf(m2) AS n_skip FROM (
          SELECT user_id,
                 sequenceMatch('(?1)(?t<=86400)(?2)')(ts,
                   event_type = 'view', event_type = 'purchase') AS m1,
                 sequenceMatch('(?1).*(?2)')(ts,
                   event_type = 'view', event_type = 'purchase') AS m2
          FROM events
          GROUP BY user_id)""")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                 FROM events WHERE event_type IN ('view', 'purchase')),
      u AS (SELECT DISTINCT user_id FROM e),
      flags AS (SELECT u.user_id,
             EXISTS (SELECT 1 FROM e v JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > v.us
                       AND p.us - v.us <= 86400000000
                     WHERE v.user_id = u.user_id AND v.event_type = 'view'
                       AND NOT EXISTS (SELECT 1 FROM e m
                                       WHERE m.user_id = v.user_id
                                         AND m.us > v.us AND m.us < p.us))
               AS m1,
             EXISTS (SELECT 1 FROM e v JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > v.us
                     WHERE v.user_id = u.user_id AND v.event_type = 'view')
               AS m2
      FROM u)
      SELECT count(*) FILTER (WHERE m1) AS n_adjacent,
             count(*) FILTER (WHERE m2) AS n_skip
      FROM flags""")),

    // Aggregate spellings as verbatim CH text: weighted exact
    // quantile (Spark percentile's frequency arg; oracle re-expands
    // the multiset), avgWeighted over DECIMALS (FP-order-exact sums,
    // the Det convention), simpleLinearRegression / boundingRatio.
    // All over orders: o_orderkey is UNIQUE at every SF (verified;
    // lineitem carries duplicate (orderkey, linenumber) rows), so the
    // arg-extreme picks are deterministic on both engines.
    QDef("sql_ch_agg_spellings", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT o_orderpriority,
               quantileExactWeighted(0.5)(o_totalprice,
                                          modulo(o_orderkey, 7) + 1) AS wmed,
               round(avgWeighted(toDecimal64(o_totalprice, 2),
                                 toDecimal64(modulo(o_custkey, 13) + 1, 2)), 4) AS wavg,
               round(simpleLinearRegression(o_orderkey, o_totalprice).k, 4) AS slope,
               round(simpleLinearRegression(o_orderkey, o_totalprice).b, 4) AS icept,
               round(boundingRatio(o_orderkey, o_totalprice), 6) AS bratio
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }, Some("""
      WITH expanded AS (SELECT o_orderpriority, o_totalprice,
                               unnest(generate_series(1, o_orderkey % 7 + 1))
                        FROM orders)
      SELECT o.o_orderpriority,
             (SELECT quantile_cont(e.o_totalprice, 0.5) FROM expanded e
              WHERE e.o_orderpriority = o.o_orderpriority) AS wmed,
             round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) *
                            CAST(o_custkey % 13 + 1 AS DECIMAL(18,2))) /
                        sum(CAST(o_custkey % 13 + 1 AS DECIMAL(18,2))) AS DOUBLE),
                   4) AS wavg,
             round(regr_slope(o_totalprice, o_orderkey), 4) AS slope,
             round(regr_intercept(o_totalprice, o_orderkey), 4) AS icept,
             round((arg_max(o_totalprice, o_orderkey) -
                    arg_min(o_totalprice, o_orderkey)) /
                   (max(o_orderkey) - min(o_orderkey)), 6) AS bratio
      FROM orders o
      GROUP BY o.o_orderpriority
      ORDER BY o.o_orderpriority""")),

    // Wave 27: the categorical-association aggregate SPELLINGS
    // (cramersV / cramersVBiasCorrected / theilsU / contingency) as a
    // user types them through the front door, hash-matched against an
    // independent DuckDB contingency-table computation (χ² + entropy
    // algebra; Bergsma's bias correction for vbc). One collected-map
    // UDAF pass on the Spark side — O(distinct pairs) state.
    QDef("sql_ch_assoc_spellings", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT round(cramersV(o_orderstatus, o_orderpriority), 4) AS v,
               round(cramersVBiasCorrected(o_orderstatus, o_orderpriority), 4) AS vbc,
               round(theilsU(o_orderstatus, o_orderpriority), 4) AS tu,
               round(contingency(o_orderstatus, o_orderpriority), 4) AS cg
        FROM orders""")
    }, Some("""
      WITH cells AS (SELECT o_orderstatus AS a, o_orderpriority AS b,
                            count(*) AS nij FROM orders GROUP BY 1, 2),
      rws AS (SELECT a, CAST(sum(nij) AS DOUBLE) AS ni FROM cells GROUP BY 1),
      cls AS (SELECT b, CAST(sum(nij) AS DOUBLE) AS nj FROM cells GROUP BY 1),
      tot AS (SELECT CAST(sum(nij) AS DOUBLE) AS n,
                     (SELECT CAST(count(*) AS DOUBLE) FROM rws) AS r,
                     (SELECT CAST(count(*) AS DOUBLE) FROM cls) AS c
              FROM cells),
      x AS (SELECT sum((nij - e) * (nij - e) / e) AS chi2
            FROM (SELECT nij, ni * nj / n AS e
                  FROM cells JOIN rws USING (a) JOIN cls USING (b)
                       CROSS JOIN tot)),
      hx AS (SELECT sum(-(ni / n) * ln(ni / n)) AS h_x
             FROM rws CROSS JOIN tot),
      hxy AS (SELECT sum(-(nij / n) * ln(CAST(nij AS DOUBLE) / nj)) AS h_x_given_y
              FROM cells JOIN cls USING (b) CROSS JOIN tot)
      SELECT round(sqrt(chi2 / (n * (least(r, c) - 1))), 4) AS v,
             round(sqrt(greatest(0, chi2 / n - (r - 1) * (c - 1) / (n - 1)) /
                        (least(r - (r - 1) * (r - 1) / (n - 1),
                               c - (c - 1) * (c - 1) / (n - 1)) - 1)), 4) AS vbc,
             round((h_x - h_x_given_y) / h_x, 4) AS tu,
             round(sqrt(chi2 / (chi2 + n)), 4) AS cg
      FROM x CROSS JOIN hx CROSS JOIN hxy CROSS JOIN tot""")),

    // Wave 28 scalars: SQL/JSON trio on VARIANT (JSON_VALUE scalar-
    // only, JSON_QUERY array-wrapped, JSON_EXISTS), byteSlice,
    // UTF8-position search, case-insensitive match count, safe base58,
    // variantElement with type-gate + default — every value computed
    // independently by DuckDB's own json/string machinery.
    QDef("sql_ch_w28_scalars", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
          JSON_VALUE('{"a": {"b": ' || toString(n_nationkey) || '}}', '$.a.b') AS jv,
          JSON_QUERY('{"a": [' || toString(n_nationkey) || ', 2]}', '$.a') AS jq,
          JSON_EXISTS(CASE WHEN n_nationkey % 2 = 0 THEN '{"a": 1}'
                           ELSE '{"b": 1}' END, '$.a') AS je,
          byteSlice(n_name, 2, 3) AS bs,
          arrayStringConcat(arrayMap(x -> toString(x),
            multiSearchAllPositionsUTF8(n_name, ['A', 'AN'])), ',') AS msp,
          CAST(countMatchesCaseInsensitive(n_name, 'a') AS Int64) AS cm,
          tryBase58Decode(CASE WHEN n_nationkey % 2 = 0
                               THEN base58Encode(n_name) ELSE '#' END) AS b58,
          variantElement(CAST(toString(n_nationkey) AS JSON), 'Int64') AS ve,
          variantElement(CAST(concat('"', n_name, '"') AS JSON), 'Int64',
                         CAST(n_regionkey - 9 AS Int64)) AS vd
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
        json_extract_string('{"a": {"b": ' || CAST(n_nationkey AS VARCHAR)
          || '}}', '$.a.b') AS jv,
        '[' || CAST(json_extract('{"a": [' || CAST(n_nationkey AS VARCHAR)
          || ', 2]}', '$.a') AS VARCHAR) || ']' AS jq,
        n_nationkey % 2 = 0 AS je,
        substring(n_name, 2, 3) AS bs,
        CAST(strpos(n_name, 'A') AS VARCHAR) || ',' ||
          CAST(strpos(n_name, 'AN') AS VARCHAR) AS msp,
        CAST(len(regexp_extract_all(n_name, '(?i)a')) AS BIGINT) AS cm,
        CASE WHEN n_nationkey % 2 = 0 THEN n_name END AS b58,
        CAST(n_nationkey AS BIGINT) AS ve,
        CAST(n_regionkey - 9 AS BIGINT) AS vd
      FROM nation ORDER BY k""")),

    // Wave 28 aggregates: rankCorr (tie-averaged Spearman),
    // analysisOfVariance F, categoricalInformationValue,
    // intervalLengthSum (union sweep), the exponentialTimeDecayed
    // family (weights at the group's latest time point), bare
    // default-level quantile spellings, groupArrayInsertAt — each
    // re-derived in DuckDB from first principles (rank windows, group
    // moments, island sweep, exp weights, row-replication weighted
    // median, series left-join).
    QDef("sql_ch_w28_aggs", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT
          round(rankCorr(toFloat64(l_quantity), toFloat64(l_extendedprice)), 6) AS rc,
          round(tupleElement(analysisOfVariance(toFloat64(l_extendedprice),
            l_linenumber % 3), 1), 6) AS af,
          round(arrayElement(categoricalInformationValue(l_quantity > 25,
            l_orderkey % 2), 1), 6) AS civ,
          round(intervalLengthSum(toFloat64(l_quantity),
            toFloat64(l_quantity + l_linenumber)), 4) AS ils,
          round(exponentialTimeDecayedSum(100)(toFloat64(l_extendedprice) / 1000,
            toFloat64(l_quantity)), 4) AS eds,
          round(exponentialTimeDecayedAvg(100)(toFloat64(l_extendedprice) / 1000,
            toFloat64(l_quantity)), 4) AS eda,
          round(exponentialTimeDecayedCount(50)(toFloat64(l_quantity)), 4) AS edc,
          round(exponentialTimeDecayedMax(100)(toFloat64(l_extendedprice) / 1000,
            toFloat64(l_quantity)), 4) AS edm,
          quantileDeterministic(toFloat64(l_quantity), l_orderkey) AS qd,
          quantileTimingWeighted(toFloat64(l_quantity), l_linenumber) AS qtw,
          arrayStringConcat(groupArrayInsertAt('-', 8)(toString(l_linenumber),
            CAST(l_quantity AS Int64) % 8), '|') AS gia
        FROM lineitem WHERE l_orderkey % 97 = 1""")
    }, Some("""
      WITH src AS (SELECT * FROM lineitem WHERE l_orderkey % 97 = 1),
      rnk AS (SELECT rank() OVER (ORDER BY l_quantity) +
                       (count(*) OVER (PARTITION BY l_quantity) - 1) / 2.0 AS rx,
                     rank() OVER (ORDER BY l_extendedprice) +
                       (count(*) OVER (PARTITION BY l_extendedprice) - 1) / 2.0 AS ry
              FROM src),
      rc AS (SELECT corr(rx, ry) AS rc FROM rnk),
      ag AS (SELECT l_linenumber % 3 AS grp, count(*) AS c,
                    sum(l_extendedprice) AS s,
                    sum(l_extendedprice * l_extendedprice) AS ss
             FROM src GROUP BY 1),
      af AS (SELECT ((sum(c * (s / c - (SELECT sum(s) FROM ag) /
                                       (SELECT sum(c) FROM ag)) *
                              (s / c - (SELECT sum(s) FROM ag) /
                                       (SELECT sum(c) FROM ag))))
                     / (count(*) - 1)) /
                    (((SELECT sum(ss) FROM ag) -
                      (SELECT sum(c) FROM ag) *
                        ((SELECT sum(s) FROM ag) / (SELECT sum(c) FROM ag)) *
                        ((SELECT sum(s) FROM ag) / (SELECT sum(c) FROM ag)) -
                      sum(c * (s / c - (SELECT sum(s) FROM ag) /
                                       (SELECT sum(c) FROM ag)) *
                             (s / c - (SELECT sum(s) FROM ag) /
                                      (SELECT sum(c) FROM ag))))
                     / ((SELECT sum(c) FROM ag) - count(*))) AS af
             FROM ag),
      cv AS (SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS c,
                    CAST(l_orderkey % 2 AS INT) AS t FROM src),
      civg AS (SELECT
                 CAST(count(*) FILTER (c = 1 AND t = 1) AS DOUBLE) AS g1,
                 CAST(count(*) FILTER (c = 0 AND t = 1) AS DOUBLE) AS g0,
                 CAST(count(*) FILTER (c = 1 AND t = 0) AS DOUBLE) AS b1,
                 CAST(count(*) FILTER (c = 0 AND t = 0) AS DOUBLE) AS b0
               FROM cv),
      civ AS (SELECT
                (CASE WHEN g1 > 0 AND b1 > 0 THEN
                   (g1 / (g1 + g0) - b1 / (b1 + b0)) *
                   ln((g1 / (g1 + g0)) / (b1 / (b1 + b0))) ELSE 0 END) +
                (CASE WHEN g0 > 0 AND b0 > 0 THEN
                   (g0 / (g1 + g0) - b0 / (b1 + b0)) *
                   ln((g0 / (g1 + g0)) / (b0 / (b1 + b0))) ELSE 0 END) AS civ
              FROM civg),
      iv AS (SELECT CAST(l_quantity AS DOUBLE) AS s,
                    CAST(l_quantity + l_linenumber AS DOUBLE) AS e FROM src),
      isw AS (SELECT s, e, max(e) OVER (ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m
              FROM iv),
      ils AS (SELECT sum(greatest(e - greatest(s, coalesce(m, s)), 0)) AS ils
              FROM isw),
      etd AS (SELECT sum(l_extendedprice / 1000 *
                         exp((l_quantity - (SELECT max(l_quantity) FROM src))
                             / 100.0)) AS eds,
                     sum(l_extendedprice / 1000 *
                         exp((l_quantity - (SELECT max(l_quantity) FROM src))
                             / 100.0)) /
                       sum(exp((l_quantity -
                                (SELECT max(l_quantity) FROM src)) / 100.0)) AS eda,
                     sum(exp((l_quantity -
                              (SELECT max(l_quantity) FROM src)) / 50.0)) AS edc,
                     max(l_extendedprice / 1000 *
                         exp((l_quantity - (SELECT max(l_quantity) FROM src))
                             / 100.0)) AS edm
              FROM src),
      qd AS (SELECT quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS qd FROM src),
      qtw AS (SELECT quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS qtw
              FROM src JOIN (SELECT unnest(range(1, 8)) AS r) reps
                ON reps.r <= src.l_linenumber),
      gia AS (SELECT string_agg(coalesce(mv, '-'), '|' ORDER BY i) AS gia
              FROM (SELECT unnest(range(8)) AS i)
              LEFT JOIN (SELECT l_quantity % 8 AS p,
                                min(CAST(l_linenumber AS VARCHAR)) AS mv
                         FROM src GROUP BY 1) ON i = p)
      SELECT round(rc, 6) AS rc, round(af, 6) AS af, round(civ, 6) AS civ,
             round(ils, 4) AS ils, round(eds, 4) AS eds, round(eda, 4) AS eda,
             round(edc, 4) AS edc, round(edm, 4) AS edm, qd, qtw, gia
      FROM rc CROSS JOIN af CROSS JOIN civ CROSS JOIN ils CROSS JOIN etd
        CROSS JOIN qd CROSS JOIN qtw CROSS JOIN gia""")),

    // Wave 29: printf/stringCompare/editDistanceUTF8 (DuckDB has
    // printf and levenshtein natively — true cross-engine checks),
    // base32 roundtrips, the Cartesian polygon family (shoelace area,
    // edge-sum perimeter, WKT render + parse roundtrip) with
    // row-parameterized geometry so nothing is a constant echo.
    QDef("sql_ch_w29_batch", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
          printf('%02d|%s', n_nationkey, n_name) AS pf,
          CAST(stringCompare(n_name, 'KENYA') AS Int64) AS sc,
          CAST(stringCompare(n_name, 0, 3, 'KENYA', 0, 3) AS Int64) AS scs,
          CAST(editDistanceUTF8(n_name, 'KENYA') AS Int64) AS ed,
          base32Decode(base32Encode(n_name)) AS b32rt,
          tryBase32Decode(CASE WHEN n_nationkey % 2 = 0
                               THEN base32Encode(n_name) ELSE '0!' END) AS b32t,
          round(polygonAreaCartesian([[tuple(toFloat64(0), toFloat64(0)),
            tuple(toFloat64(n_nationkey + 1), toFloat64(0)),
            tuple(toFloat64(n_nationkey + 1), toFloat64(2)),
            tuple(toFloat64(0), toFloat64(2))]]), 4) AS pa,
          round(polygonPerimeterCartesian([[tuple(toFloat64(0), toFloat64(0)),
            tuple(toFloat64(n_nationkey + 3), toFloat64(0)),
            tuple(toFloat64(n_nationkey + 3),
                  toFloat64(n_nationkey + 4))]]), 4) AS pp,
          wkt([[tuple(toFloat64(0), toFloat64(0)),
                tuple(toFloat64(n_nationkey), toFloat64(0)),
                tuple(toFloat64(n_nationkey), toFloat64(1))]]) AS pw,
          round(polygonAreaCartesian(readWKTPolygon(wkt([[
            tuple(toFloat64(0), toFloat64(0)),
            tuple(toFloat64(n_nationkey), toFloat64(0)),
            tuple(toFloat64(n_nationkey), toFloat64(1))]]))), 4) AS rt
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
        printf('%02d|%s', n_nationkey, n_name) AS pf,
        CASE WHEN n_name < 'KENYA' THEN -1
             WHEN n_name > 'KENYA' THEN 1 ELSE 0 END AS sc,
        CASE WHEN substring(n_name, 1, 3) < 'KEN' THEN -1
             WHEN substring(n_name, 1, 3) > 'KEN' THEN 1 ELSE 0 END AS scs,
        CAST(levenshtein(n_name, 'KENYA') AS BIGINT) AS ed,
        n_name AS b32rt,
        CASE WHEN n_nationkey % 2 = 0 THEN n_name END AS b32t,
        round((n_nationkey + 1) * 2.0, 4) AS pa,
        round((n_nationkey + 3) + (n_nationkey + 4) +
              sqrt((n_nationkey + 3.0) * (n_nationkey + 3) +
                   (n_nationkey + 4.0) * (n_nationkey + 4)), 4) AS pp,
        'POLYGON((0 0,' || CAST(n_nationkey AS VARCHAR) || ' 0,' ||
          CAST(n_nationkey AS VARCHAR) || ' 1,0 0))' AS pw,
        round(n_nationkey / 2.0, 4) AS rt
      FROM nation ORDER BY k""")),

    // Wave 29: approx_top_k / approx_top_sum — SpaceSaving heavy
    // hitters with (item, count, error) tuples; the order-priority
    // domain has 5 distinct values, far under the reserved pool, so
    // the counts are exact and the DuckDB group-by oracle applies.
    QDef("sql_ch_w29_approx_top", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT arrayStringConcat(arrayMap(t ->
                 concat(t.item, ':', toString(t.count), ':', toString(t.error)),
                 approx_top_k(3)(o_orderpriority)), '|') AS tk,
               arrayStringConcat(arrayMap(t ->
                 concat(t.item, ':', toString(t.count)),
                 approx_top_sum(3)(o_orderpriority, o_custkey % 3 + 2)), '|') AS ts
        FROM orders""")
    }, Some("""
      WITH c AS (SELECT o_orderpriority AS v, count(*) AS n,
                        CAST(sum(o_custkey % 3 + 2) AS BIGINT) AS w
                 FROM orders GROUP BY 1)
      SELECT
        (SELECT string_agg(v || ':' || CAST(n AS VARCHAR) || ':0', '|'
                           ORDER BY n DESC, v)
         FROM (SELECT v, n FROM c ORDER BY n DESC, v LIMIT 3)) AS tk,
        (SELECT string_agg(v || ':' || CAST(w AS VARCHAR), '|'
                           ORDER BY w DESC, v)
         FROM (SELECT v, w FROM c ORDER BY w DESC, v LIMIT 3)) AS ts""")),

    // Wave 31: hierarchical dictionaries (the forest is nation →
    // region+1 with regions as roots, so the oracle can unroll the
    // 2-level chains without recursion), typed JSONExtract against
    // DuckDB's own json machinery, CH-byte-semantics bin + roundtrip,
    // tuple intDiv/modulo, URL hierarchy walks.
    QDef("sql_ch_w31_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        CREATE TABLE w31_hier_src ENGINE = Memory AS
        SELECT CAST(n_nationkey + 1 AS Int64) AS node,
               CAST(CASE WHEN n_nationkey < 5 THEN 0
                         ELSE n_regionkey + 1 END AS Int64) AS parent
        FROM nation""")
      Graft.sql(s, """
        CREATE DICTIONARY w31_hier (node Int64, parent Int64)
        PRIMARY KEY node SOURCE(CLICKHOUSE(TABLE 'w31_hier_src'))
        LAYOUT(FLAT()) LIFETIME(300)""")
      Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
          arrayStringConcat(arrayMap(x -> toString(x),
            dictGetHierarchy('w31_hier', n_nationkey + 1)), '|') AS chain,
          dictIsIn('w31_hier', n_nationkey + 1, 3) AS in3,
          CAST(size(dictGetChildren('w31_hier', n_nationkey + 1)) AS Int64) AS nch,
          CAST(size(dictGetDescendants('w31_hier', n_nationkey + 1)) AS Int64) AS nd,
          JSONExtract('{"a": {"b": [' || toString(n_nationkey) || ', 9]}}',
                      'a', 'b', 1, 'Int64') AS jx,
          JSONExtract('{"s": "' || n_name || '"}', 's', 'String') AS js,
          JSONExtract('{}', 'nope', 'Int64') AS jd,
          bin(substring(n_name, 1, 1)) AS bn,
          unbin(bin(n_name)) AS ubrt,
          CAST(tupleElement(tupleIntDiv(tuple(n_nationkey, 17),
            tuple(3, 5)), 1) AS Int64) AS tid,
          CAST(tupleElement(tupleModulo(tuple(n_nationkey, 17),
            tuple(3, 5)), 2) AS Int64) AS tmo,
          arrayStringConcat(URLHierarchy('https://ex.com/' || n_name || '/x'),
            ' ') AS uh,
          CAST(visibleWidth(n_nationkey * 100) AS Int64) AS vw
        FROM nation ORDER BY k""")
    }, Some("""
      WITH ch AS (SELECT n_nationkey AS nk,
                         CASE WHEN n_nationkey < 5
                              THEN CAST(n_nationkey + 1 AS VARCHAR)
                              ELSE CAST(n_nationkey + 1 AS VARCHAR) || '|' ||
                                   CAST(n_regionkey + 1 AS VARCHAR) END AS chain,
                         CASE WHEN n_nationkey < 5 THEN n_nationkey + 1
                              ELSE n_regionkey + 1 END AS root
                  FROM nation),
      kids AS (SELECT n_regionkey + 1 AS p, count(*) AS c
               FROM nation WHERE n_nationkey >= 5 GROUP BY 1)
      SELECT CAST(n.n_nationkey AS BIGINT) AS k,
        ch.chain AS chain,
        ch.root = 3 AS in3,
        CAST(coalesce(k2.c, 0) AS BIGINT) AS nch,
        CAST(coalesce(k2.c, 0) AS BIGINT) AS nd,
        CAST(n.n_nationkey AS BIGINT) AS jx,
        n.n_name AS js,
        CAST(0 AS BIGINT) AS jd,
        lpad(bin(ascii(substring(n.n_name, 1, 1))), 8, '0') AS bn,
        n.n_name AS ubrt,
        CAST(n.n_nationkey // 3 AS BIGINT) AS tid,
        CAST(2 AS BIGINT) AS tmo,
        'https://ex.com/ https://ex.com/' || n.n_name ||
          '/ https://ex.com/' || n.n_name || '/x' AS uh,
        CAST(length(CAST(n.n_nationkey * 100 AS VARCHAR)) AS BIGINT) AS vw
      FROM nation n JOIN ch ON ch.nk = n.n_nationkey
      LEFT JOIN kids k2 ON k2.p = n.n_nationkey + 1
      ORDER BY k""")),

    // Wave 33: byte analysis (hamming/uniq/entropy vs DuckDB's own
    // char algebra + entropy aggregate), parse inverses
    // (parseReadableSize/parseTimeDelta recomputed arithmetically),
    // HTML→text extraction re-derived with DuckDB regexp_replace,
    // and multiMatchAllIndices vs per-pattern regexp_matches.
    QDef("sql_ch_w33_batch", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
          CAST(byteHammingDistance(n_name,
            translate(n_name, 'AEIOU', 'XXXXX')) AS Int64) AS bhd,
          CAST(stringBytesUniq(n_name) AS Int64) AS sbu,
          round(stringBytesEntropy(n_name), 4) AS sbe,
          parseReadableSize(concat(toString(n_nationkey * 37), ' B')) AS prs,
          parseReadableSize(concat(toString(n_nationkey + 1), ' KiB')) AS prs2,
          round(parseTimeDelta(concat(toString(n_nationkey), 'm 30s')), 1) AS ptd,
          firstLine(concat(n_name, char(10), 'rest')) AS fl,
          basename(concat('/a/b/', n_name)) AS bn,
          encodeXMLComponent(concat('<', n_name, '&')) AS ex,
          extractTextFromHTML(concat('<p>', n_name,
            ' &amp; <b>co</b></p>')) AS ht,
          arrayStringConcat(arrayMap(x -> toString(x),
            multiMatchAllIndices(n_name, ['^A', 'N', 'A$'])), ',') AS mmi,
          toUUIDOrNull(CASE WHEN n_nationkey % 2 = 0
            THEN '61F0C404-5CB3-11E7-907B-A6006AD3DBA0'
            ELSE n_name END) AS uu
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
        CAST(len(regexp_extract_all(n_name, '[AEIOU]')) AS BIGINT) AS bhd,
        CAST(len(list_distinct(regexp_extract_all(n_name, '.'))) AS BIGINT)
          AS sbu,
        round((SELECT entropy(c)
               FROM unnest(regexp_extract_all(n_name, '.')) AS t(c)), 4) AS sbe,
        CAST(n_nationkey * 37 AS BIGINT) AS prs,
        CAST((n_nationkey + 1) * 1024 AS BIGINT) AS prs2,
        round(n_nationkey * 60.0 + 30, 1) AS ptd,
        n_name AS fl,
        n_name AS bn,
        '&lt;' || n_name || '&amp;' AS ex,
        n_name || ' & co' AS ht,
        concat_ws(',',
          CASE WHEN regexp_matches(n_name, '^A') THEN '1' END,
          CASE WHEN regexp_matches(n_name, 'N') THEN '2' END,
          CASE WHEN regexp_matches(n_name, 'A$') THEN '3' END) AS mmi,
        CASE WHEN n_nationkey % 2 = 0
             THEN '61f0c404-5cb3-11e7-907b-a6006ad3dba0' END AS uu
      FROM nation ORDER BY k""")),

    // joinGet: Join-engine-table lookups as plan-shipped literal maps
    // (key = the table's first column); the oracle is the LEFT JOIN
    // the lookup replaces. joinGet falls back to the value TYPE's
    // default on a miss (CH's join_use_nulls=0 default — '' here);
    // joinGetOrNull is the NULL spelling (join_use_nulls=1).
    QDef("sql_ch_joinget", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
               joinGet('region', 'r_name', n_regionkey) AS rn,
               joinGetOrNull('region', 'r_name', n_nationkey) AS maybe,
               joinGet('region', 'r_name', n_nationkey) AS dflt
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n.n_nationkey AS BIGINT) AS k, r.r_name AS rn,
             r2.r_name AS maybe,
             coalesce(r2.r_name, '') AS dflt
      FROM nation n
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
      LEFT JOIN region r2 ON n.n_nationkey = r2.r_regionkey
      ORDER BY k""")),

    // bin/unbin with CH width semantics through the front door: a
    // numeric argument prints its declared type's FULL width (Int8→8
    // … Int64→64 bits, never stringified), strings one 8-bit group
    // per UTF-8 byte; unbin inverts the string payload. The oracle
    // recomposes each width from DuckDB's minimal-bits bin via lpad
    // (values are non-negative so no two's-complement divergence).
    QDef("sql_ch_bin_widths", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
               bin(CAST(n_nationkey AS Int8)) AS b8,
               bin(CAST(n_nationkey AS Int16)) AS b16,
               bin(CAST(n_nationkey AS Int32)) AS b32,
               bin(CAST(n_nationkey AS Int64)) AS b64,
               bin(substring(n_name, 1, 2)) AS bs,
               unbin(bin(n_name)) AS rt
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
             lpad(bin(n_nationkey), 8, '0') AS b8,
             lpad(bin(n_nationkey), 16, '0') AS b16,
             lpad(bin(n_nationkey), 32, '0') AS b32,
             lpad(bin(n_nationkey), 64, '0') AS b64,
             lpad(bin(ascii(substring(n_name, 1, 1))), 8, '0') ||
               lpad(bin(ascii(substring(n_name, 2, 1))), 8, '0') AS bs,
             n_name AS rt
      FROM nation ORDER BY k""")),

    // Wave 30: the ML regression pack. stochasticLinearRegression's
    // deterministic closed form is checked against DuckDB's own
    // regr_slope/regr_intercept (independent covariance algebra), the
    // ridge (l2 > 0) leg against the hand-derived shrinkage closed
    // form slope = Sxy_c/(Sxx_c + l2·n), and evalMLMethod against the
    // recomposed dot product.
    QDef("sql_ch_w30_ml", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT round(arrayElement(tupleElement(m, 'weights'), 1), 6) AS slope,
               round(arrayElement(tupleElement(m, 'weights'), 2), 6) AS icept,
               round(evalMLMethod(m, 30.0), 6) AS pred,
               round(arrayElement(tupleElement(mr, 'weights'), 1), 6) AS rslope,
               round(arrayElement(tupleElement(mr, 'weights'), 2), 6) AS ricept
        FROM (SELECT
          stochasticLinearRegression(0.1, 0.0, 32, 'SGD')(
            toFloat64(l_extendedprice) / 1000, toFloat64(l_quantity)) AS m,
          stochasticLinearRegression(0.1, 2.5, 32, 'SGD')(
            toFloat64(l_extendedprice) / 1000, toFloat64(l_quantity)) AS mr
          FROM lineitem)""")
    }, Some("""
      WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
                        CAST(l_extendedprice AS DOUBLE) / 1000 AS y
                 FROM lineitem),
      m AS (SELECT regr_slope(y, x) AS slope, regr_intercept(y, x) AS icept,
                   count(*) AS n, avg(x) AS mx, avg(y) AS my,
                   sum((x - (SELECT avg(x) FROM s)) *
                       (y - (SELECT avg(y) FROM s))) AS sxy,
                   sum((x - (SELECT avg(x) FROM s)) *
                       (x - (SELECT avg(x) FROM s))) AS sxx
            FROM s)
      SELECT round(slope, 6) AS slope, round(icept, 6) AS icept,
             round(slope * 30.0 + icept, 6) AS pred,
             round(sxy / (sxx + 2.5 * n), 6) AS rslope,
             round(my - sxy / (sxx + 2.5 * n) * mx, 6) AS ricept
      FROM m""")),

    // Wave 28 window spellings: leadInFrame/lagInFrame with the CH
    // canonical full frame (stripped — lag/lead read only the order),
    // nonNegativeDerivative expanded to the lag-difference quotient
    // per the INTERVAL unit; DuckDB recomputes via its own lag/lead.
    QDef("sql_ch_w28_window", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT CAST(n_nationkey AS Int64) AS k,
          CAST(leadInFrame(n_nationkey, 1, -1) OVER (PARTITION BY n_regionkey
            ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND
            UNBOUNDED FOLLOWING) AS Int64) AS ld,
          CAST(lagInFrame(n_nationkey, 2, -1) OVER (PARTITION BY n_regionkey
            ORDER BY n_nationkey ROWS BETWEEN UNBOUNDED PRECEDING AND
            UNBOUNDED FOLLOWING) AS Int64) AS lg2,
          round(nonNegativeDerivative(toFloat64(n_nationkey * n_nationkey),
            timestampadd(SECOND, n_nationkey * 2,
              toDateTime('2024-01-01 00:00:00')), INTERVAL 1 SECOND)
            OVER (PARTITION BY n_regionkey ORDER BY n_nationkey), 4) AS nnd
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT CAST(n_nationkey AS BIGINT) AS k,
        CAST(lead(n_nationkey, 1, -1) OVER w AS BIGINT) AS ld,
        CAST(lag(n_nationkey, 2, -1) OVER w AS BIGINT) AS lg2,
        round(CASE WHEN lag(n_nationkey) OVER w IS NULL THEN 0.0
          ELSE greatest(0.0,
            CAST(n_nationkey * n_nationkey -
                 lag(n_nationkey * n_nationkey) OVER w AS DOUBLE) /
            (2.0 * (n_nationkey - lag(n_nationkey) OVER w))) END, 4) AS nnd
      FROM nation
      WINDOW w AS (PARTITION BY n_regionkey ORDER BY n_nationkey)
      ORDER BY k""")),

    // String-search spellings over real document text, every value
    // hash-checked: countSubstrings (non-overlapping needle count),
    // case-insensitive position, regex match count.
    QDef("sql_ch_string_search", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT doc_id,
               countSubstrings(text, 'data') AS n_data,
               positionCaseInsensitive(text, 'THE') AS p_the,
               countMatches(text, '[0-9]+') AS n_nums
        FROM documents
        WHERE doc_id % 37 = 0
        ORDER BY doc_id
        LIMIT 300""")
    }, Some("""
      SELECT doc_id,
             (length(text) - length(replace(text, 'data', ''))) // 4 AS n_data,
             position(lower('THE') IN lower(text)) AS p_the,
             CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_nums
      FROM documents
      WHERE doc_id % 37 = 0
      ORDER BY doc_id
      LIMIT 300""")),

    // CTAS + engine metadata end-to-end: CREATE TABLE … ENGINE =
    // ReplacingMergeTree(ver) ORDER BY k AS SELECT builds a sorted
    // snapshot and registers the FINAL collapse; the follow-up query
    // reads FROM t FINAL. The oracle recomputes the same
    // latest-version state straight from orders.
    QDef("sql_ch_ctas_final", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        CREATE TABLE graft_order_state ENGINE = ReplacingMergeTree(ver)
        ORDER BY (o_orderkey) AS
        SELECT o_orderkey, o_orderstatus, 1 AS ver FROM orders
        UNION ALL
        SELECT o_orderkey, 'X' AS o_orderstatus, 2 AS ver
        FROM orders WHERE o_orderkey % 3 = 0""")
      graft.Graft.sql(s, """
        SELECT o_orderstatus, count(*) AS n
        FROM graft_order_state FINAL
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    }, Some("""
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
               AS o_orderstatus,
             count(*) AS n
      FROM orders
      GROUP BY 1
      ORDER BY o_orderstatus""")),

    // ALTER TABLE ADD INDEX end-to-end: the CTAS snapshot reorganizes
    // range-partitioned on the indexed column with a bloom manifest,
    // and the equality query transparently prunes files through it
    // (read-path rewrite; the WHERE stays, so pruning is lossless by
    // construction). The oracle recomputes from the base table — a
    // hash match proves the pruned scan returned every matching row.
    QDef("sql_ch_add_index", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        CREATE TABLE graft_ord_indexed ENGINE = MergeTree ORDER BY (o_custkey) AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders""")
      graft.Graft.sql(s, """
        ALTER TABLE graft_ord_indexed ADD INDEX ck o_custkey TYPE bloom_filter
        GRANULARITY 8""")
      graft.Graft.sql(s, """
        SELECT o_orderkey, o_totalprice
        FROM graft_ord_indexed
        WHERE o_custkey = 421
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE o_custkey = 421
      ORDER BY o_orderkey""")),

    // Dialect-breadth batch as verbatim CH text: bit-function
    // spellings, exponent/rounding ladders (roundDuration/roundAge/
    // roundToExp2 — CH's web-analytics bucketing), gcd/lcm, Monday
    // truncation, dateName, sub-day timestamp arithmetic, timeSlot /
    // toStartOfInterval epoch bucketing, complete-units age(), and
    // regex match() — every value hash-checked against DuckDB.
    QDef("sql_ch_dialect_batch", (s, dir) => {
      graft.Graft.init(s, dir)
      graft.Graft.sql(s, """
        SELECT o_orderkey,
               bitAnd(o_orderkey, 255) AS band,
               bitXor(o_orderkey, 129) AS bxor,
               bitTest(o_orderkey, 3) AS btest,
               intExp2(modulo(o_orderkey, 20)) AS iexp2,
               roundDuration(modulo(o_orderkey, 40000)) AS rdur,
               roundAge(modulo(o_orderkey, 90)) AS rage,
               roundToExp2(modulo(o_orderkey, 5000)) AS rexp2,
               gcd(o_orderkey, 36) AS g,
               lcm(modulo(o_orderkey, 12) + 1, 8) AS l,
               toMonday(o_orderdate) AS monday,
               dateName('month', o_orderdate) AS mname,
               dateName('weekday', o_orderdate) AS wname,
               addHours(o_orderdate, 7) AS plus7h,
               timeSlot(addMinutes(o_orderdate, modulo(o_orderkey, 97))) AS slot,
               toStartOfInterval(addMinutes(o_orderdate, modulo(o_orderkey, 1440)),
                                 INTERVAL 15 MINUTE) AS bucket15,
               age('day', o_orderdate,
                   date_add(CAST(o_orderdate AS DATE),
                            CAST(modulo(o_orderkey, 50) AS INT))) AS aged,
               match(o_orderpriority, '^[12]') AS prio_hot
        FROM orders
        WHERE modulo(o_orderkey, 13) = 0
        ORDER BY o_orderkey
        LIMIT 200""")
    }, Some("""
      SELECT o_orderkey,
             o_orderkey & 255 AS band,
             xor(o_orderkey, 129) AS bxor,
             CAST((o_orderkey >> 3) & 1 AS TINYINT) AS btest,
             (CAST(1 AS BIGINT) << CAST(o_orderkey % 20 AS INT)) AS iexp2,
             COALESCE(list_max(list_filter(
               [1, 10, 30, 60, 120, 180, 240, 300, 600, 1200, 1800,
                3600, 7200, 18000, 36000],
               v -> v <= o_orderkey % 40000)), 0) AS rdur,
             CASE WHEN o_orderkey % 90 < 1 THEN 0
                  WHEN o_orderkey % 90 < 18 THEN 17
                  WHEN o_orderkey % 90 < 25 THEN 18
                  WHEN o_orderkey % 90 < 35 THEN 25
                  WHEN o_orderkey % 90 < 45 THEN 35
                  WHEN o_orderkey % 90 < 55 THEN 45 ELSE 55 END AS rage,
             CASE WHEN o_orderkey % 5000 < 1 THEN 0
                  ELSE (CAST(1 AS BIGINT) <<
                        CAST(floor(log2(o_orderkey % 5000)) AS INT)) END AS rexp2,
             gcd(o_orderkey, 36) AS g,
             lcm(o_orderkey % 12 + 1, 8) AS l,
             CAST(date_trunc('week', o_orderdate) AS DATE) AS monday,
             monthname(o_orderdate) AS mname,
             dayname(o_orderdate) AS wname,
             CAST(o_orderdate AS TIMESTAMP) + INTERVAL 7 HOUR AS plus7h,
             make_timestamp(CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)
               + (o_orderkey % 97) * INTERVAL 1 MINUTE) / 1800) * 1800
               AS BIGINT) * 1000000) AS slot,
             make_timestamp(CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)
               + (o_orderkey % 1440) * INTERVAL 1 MINUTE) / 900) * 900
               AS BIGINT) * 1000000) AS bucket15,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(o_orderdate AS DATE) + CAST(o_orderkey % 50 AS INT))
               AS aged,
             regexp_matches(o_orderpriority, '^[12]') AS prio_hot
      FROM orders
      WHERE o_orderkey % 13 = 0
      ORDER BY o_orderkey
      LIMIT 200""")),

    // CH bracket syntax through the front door: `[…]` array literals
    // (Spark's parser rejects them) and 1-BASED subscripts (Spark's
    // native subscript is 0-based — verbatim CH text would otherwise
    // run silently off by one). ChSql.rewriteBrackets lexes them
    // string-aware into array(…)/try_element_at(…); tuple ordinal
    // access `t.1` and tupleElement(t, n) compile to GetStructField.
    // DuckDB's list syntax is natively 1-based, so the oracle writes
    // the SAME subscripts and must agree element for element.
    QDef("sql_ch_brackets", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT k, num_part, first_of_pair, band, mapped,
               tupleElement(tup, 2) AS tname, tup.1 AS tkey
        FROM (
          SELECT n_nationkey AS k,
                 splitByChar('_', n_name)[2] AS num_part,
                 [n_nationkey, n_regionkey][1] AS first_of_pair,
                 ['low','high'][if(n_regionkey >= 2, 2, 1)] AS band,
                 map('r', n_regionkey)['r'] AS mapped,
                 tuple(n_nationkey, n_name) AS tup
          FROM nation)
        ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
             string_split(n_name, '_')[2] AS num_part,
             [n_nationkey, n_regionkey][1] AS first_of_pair,
             ['low','high'][CASE WHEN n_regionkey >= 2 THEN 2 ELSE 1 END] AS band,
             n_regionkey AS mapped,
             n_name AS tname,
             n_nationkey AS tkey
      FROM nation
      ORDER BY k""")),

    // LIMIT n WITH TIES as verbatim text — Spark has no native WITH
    // TIES; ChSql routes it as a distributed two-TakeOrdered
    // threshold + broadcast lexicographic filter (no global rank
    // window). Ties are real here: rank 10 lands mid-tie on
    // o_orderpriority, so the result is the whole first priority
    // class. The outer orderBy exists only to make the dump total —
    // the tie semantics come from the routed ORDER BY.
    QDef("sql_ch_limit_ties", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT o_orderkey, o_orderpriority
        FROM orders
        ORDER BY o_orderpriority
        LIMIT 10 WITH TIES""")
        .orderBy("o_orderpriority", "o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderpriority FROM orders
      QUALIFY rank() OVER (ORDER BY o_orderpriority) <= 10
      ORDER BY o_orderpriority, o_orderkey""")),

    // SELECT DISTINCT ON (k) as verbatim text — CH's spelling of
    // "first row per key in this order" (documented equivalent of
    // LIMIT 1 BY). Routed onto LimitByPlan, so the plan is the
    // partial/final bounded-heap operator, not a window.
    QDef("sql_ch_distinct_on", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT DISTINCT ON (o_custkey)
               o_custkey, o_orderkey, o_orderdate
        FROM orders
        ORDER BY o_custkey, o_orderdate, o_orderkey""")
    }, Some("""
      SELECT o_custkey, o_orderkey, o_orderdate
      FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders)
      WHERE rn = 1
      ORDER BY o_custkey, o_orderdate, o_orderkey""")),

    // Generic aggregate-combinator chains as verbatim text: CH glues
    // -If / -OrNull / -Distinct / -Array onto ANY aggregate name;
    // ChDialect.combinatorBuilder peels unresolved names on demand
    // (registered fixed spellings cover only the hot ones). Also the
    // parametric+If form `quantileIf(p)(x, cond)` → FILTER clause.
    QDef("sql_ch_combinators", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_returnflag,
               arrayStringConcat(arraySort(
                 groupUniqArrayIf(l_linenumber, l_quantity > 45)), '|') AS lines_hi,
               countDistinctIf(l_suppkey, l_quantity > 45) AS supp_hi,
               uniqExactOrNullIf(l_partkey, l_discount > 0.2) AS none_match,
               sumArrayIf([l_linenumber, 2 * l_linenumber], l_quantity > 45) AS arr_sum,
               round(avgArray([l_linenumber, l_linenumber + 3]), 6) AS arr_avg,
               round(quantileIf(0.5)(l_quantity, l_discount > 0.02), 4) AS med_disc
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag,
             array_to_string(list_sort(list(DISTINCT l_linenumber)
               FILTER (WHERE l_quantity > 45)), '|') AS lines_hi,
             count(DISTINCT l_suppkey) FILTER (WHERE l_quantity > 45) AS supp_hi,
             nullif(count(DISTINCT l_partkey)
               FILTER (WHERE l_discount > 0.2), 0) AS none_match,
             CAST(sum(3 * l_linenumber)
               FILTER (WHERE l_quantity > 45) AS BIGINT) AS arr_sum,
             round((CAST(sum(l_linenumber) AS DOUBLE) + sum(l_linenumber + 3))
               / (2 * count(*)), 6) AS arr_avg,
             round(quantile_cont(l_quantity, 0.5)
               FILTER (WHERE l_discount > 0.02), 4) AS med_disc
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),

    // -ForEach combinator: elementwise aggregation across rows at each
    // array position (the per-position sums/counts UDAF). Integral
    // inputs keep the double sums exact, so results are
    // partition-order independent and hash-comparable.
    QDef("sql_ch_foreach", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_returnflag,
               arrayStringConcat(
                 CAST(sumForEach([toFloat64(l_linenumber), 1.0]) AS Array(Int64)),
                 '|') AS s_each,
               arrayStringConcat(
                 countForEach([l_linenumber, l_linenumber]), '|') AS c_each,
               round(avgForEach([toFloat64(l_linenumber), toFloat64(l_quantity)])[1], 6) AS avg_line,
               round(avgForEach([toFloat64(l_linenumber), toFloat64(l_quantity)])[2], 6) AS avg_qty,
               minForEach([toFloat64(l_quantity), 2.0])[1] AS min_qty
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")
    }, Some("""
      SELECT l_returnflag,
             array_to_string([CAST(sum(l_linenumber) AS BIGINT),
                              CAST(count(*) AS BIGINT)], '|') AS s_each,
             array_to_string([count(*), count(*)], '|') AS c_each,
             round(CAST(sum(l_linenumber) AS DOUBLE) / count(*), 6) AS avg_line,
             round(CAST(sum(l_quantity) AS DOUBLE) / count(*), 6) AS avg_qty,
             min(l_quantity) AS min_qty
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag""")),

    // COLUMNS('re') APPLY(f) [APPLY(g)] — CH's column-selector sugar
    // expanded against the FROM schema, results named `f(col)` exactly
    // as CH prints them (the chain wraps innermost-first).
    QDef("sql_ch_apply", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT COLUMNS('_(order|part|supp)key$') APPLY(max) FROM lineitem""")
    }, Some("""
      SELECT max(l_orderkey) AS "max(l_orderkey)",
             max(l_partkey)  AS "max(l_partkey)",
             max(l_suppkey)  AS "max(l_suppkey)"
      FROM lineitem""")),

    // CREATE DICTIONARY + the dictGet family (§2.8 dictionary): the
    // dictionary loads from its source table into a literal map baked
    // into the expression tree — it ships with the serialized plan to
    // every executor, the same distribution model as CH's replicated
    // in-RAM dictionaries, and the lookup is a codegen'd element_at
    // (no join, no shuffle). The relational oracle is the LEFT JOIN
    // the dictionary replaces.
    QDef("sql_ch_dictget", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        CREATE DICTIONARY nation_dict
          (n_nationkey Int64, n_name String, n_regionkey Int64)
        PRIMARY KEY n_nationkey
        SOURCE(CLICKHOUSE(TABLE 'nation')) LAYOUT(HASHED()) LIFETIME(600)""")
      Graft.sql(s, """
        SELECT dictGet('nation_dict', 'n_name', c_nationkey) AS nation,
               dictGetInt64('nation_dict', 'n_regionkey', c_nationkey) AS region,
               dictGetOrDefault('nation_dict', 'n_name', c_nationkey + 100, 'none') AS fallback,
               count(*) AS c,
               CAST(sum(if(dictHas('nation_dict', c_nationkey), 1, 0)) AS BIGINT) AS have
        FROM customer
        GROUP BY nation, region, fallback
        ORDER BY nation""")
    }, Some("""
      SELECT n.n_name AS nation, CAST(n.n_regionkey AS BIGINT) AS region,
             'none' AS fallback, count(*) AS c, count(*) AS have
      FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY nation, region, fallback
      ORDER BY nation""")),

    // file('path') table function (§2.1 I/O): the path resolves
    // against the registered data dir (CH user_files_path analog),
    // format inferred from the extension; the read is a normal
    // parquet scan — pruning and pushdown apply as on any table.
    QDef("sql_ch_file", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT p_brand, count(*) AS n,
               min(p_retailprice) AS lo, max(p_retailprice) AS hi
        FROM file('part.parquet')
        GROUP BY p_brand ORDER BY p_brand""")
    }, Some("""
      SELECT p_brand, count(*) AS n,
             min(p_retailprice) AS lo, max(p_retailprice) AS hi
      FROM part GROUP BY p_brand ORDER BY p_brand""")),

    // CH VALUES('schema', rows…) table function joined as a small
    // inline dimension — the rewrite casts positional columns to the
    // declared CH types; AQE broadcasts the 5-row side.
    QDef("sql_ch_values_tf", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT r.r_name AS region, v.mult AS mult, count(*) AS c
        FROM nation n
        JOIN region r ON n.n_regionkey = r.r_regionkey
        JOIN VALUES('rk Int64, mult Int64',
                    (0, 10), (1, 20), (2, 30), (3, 40), (4, 50)) v
          ON n.n_regionkey = v.rk
        GROUP BY region, mult ORDER BY region""")
    }, Some("""
      SELECT r.r_name AS region, v.mult AS mult, count(*) AS c
      FROM nation n
      JOIN region r ON n.n_regionkey = r.r_regionkey
      JOIN (VALUES (0, 10), (1, 20), (2, 30), (3, 40), (4, 50)) v(rk, mult)
        ON n.n_regionkey = v.rk
      GROUP BY region, mult ORDER BY region""")),

    // numbers(offset, count) — the 2-arg CH form onto a lazy range()
    // scan with partial aggregation (nothing materializes the rows).
    QDef("sql_ch_numbers2", (s, dir) => {
      Graft.sql(s, """
        SELECT number % 9 AS bucket, count(*) AS n,
               CAST(sum(number) AS BIGINT) AS total
        FROM numbers(10000, 35000)
        GROUP BY bucket ORDER BY bucket""")
    }, Some("""
      SELECT range % 9 AS bucket, count(*) AS n,
             CAST(sum(range) AS BIGINT) AS total
      FROM range(10000, 45000) GROUP BY bucket ORDER BY bucket""")),

    // CH clauses INSIDE a FROM subquery: the inner `LIMIT 2 BY` routes
    // recursively through the front door (partial/final LimitByPlan
    // under the outer aggregate). Decimal sum keeps the total
    // FP-order independent.
    QDef("sql_ch_sub_clauses", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT count(*) AS n,
               round(CAST(sum(CAST(o_totalprice AS Decimal(22,6))) AS Float64), 4) AS total
        FROM (SELECT o_orderpriority, o_orderkey, o_totalprice
              FROM orders
              ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
              LIMIT 2 BY o_orderpriority)""")
    }, Some("""
      SELECT count(*) AS n,
             round(CAST(sum(o_totalprice) AS DOUBLE), 4) AS total
      FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders)
      WHERE rn <= 2""")),

    // generateRandom('schema', seed) — CH's synthetic-data table
    // function, made deterministic: values derive from
    // md5(seed, column, row id), never rand(), so the same query
    // yields identical bytes at any parallelism AND in DuckDB (the
    // oracle recomputes the md5 arithmetic) — the property that
    // makes synthetic data reproducible across a 1000-executor run.
    QDef("sql_ch_generate", (s, dir) => {
      Graft.sql(s, """
        SELECT a, s FROM
          (SELECT * FROM generateRandom('a Int64, s String', 7) LIMIT 20)
        ORDER BY a""")
    }, Some("""
      SELECT CAST(('0x' || substring(md5('g7_a_' || CAST(id AS VARCHAR)), 1, 15)) AS BIGINT) AS a,
             substring(md5('g7_s_' || CAST(id AS VARCHAR)), 1, 10) AS s
      FROM (SELECT range AS id FROM range(20))
      ORDER BY a""")),

    // Wave-10 scalar batch through the front door: calendar bridges
    // (Modified Julian Day, days-since-year-zero on the proleptic
    // Gregorian +366 rule), URL significant-subdomain heuristic,
    // snowflake-ID decode (compared in epoch-ms to stay
    // timezone-free), query-log normalization, array Jaccard, bitmask
    // listing, and the proportions z-test (per-field via 1-based
    // tuple ordinals; identical double expression order both sides).
    QDef("sql_ch_w10_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey,
               monthName(toDate('2024-03-05')) AS mn,
               toModifiedJulianDay('2020-01-01') + n_nationkey AS mjd,
               toDaysSinceYearZero(toDate('2023-09-08')) AS dz,
               arrayJaccardIndex([n_nationkey + 10, 1, 2],
                                 [2, 3, n_nationkey + 20]) AS jac,
               bitmaskToList(n_nationkey) AS bl,
               normalizeQuery('SELECT ' || toString(n_nationkey) || ' FROM t') AS nq,
               firstSignificantSubdomain('https://a.b.example.com/x') AS fss,
               cutToFirstSignificantSubdomain('https://news.clickhouse.com.tr/p') AS ctf,
               unix_millis(snowflakeToDateTime(1426860702823350272)) AS snow_ms,
               round(proportionsZTest(10, 11, 100, 101, 0.95, 'unpooled').1, 6) AS pz,
               round(proportionsZTest(10, 11, 100, 101, 0.95, 'unpooled').2, 6) AS pp
        FROM nation ORDER BY n_nationkey""")
    }, Some("""
      WITH zc AS (
        SELECT (10.0 / 100 - 11.0 / 101)
               / sqrt((10.0 / 100) * (1 - 10.0 / 100) / 100
                      + (11.0 / 101) * (1 - 11.0 / 101) / 101) AS z),
      -- DuckDB has no erf; inline the same Abramowitz-Stegun 7.1.26
      -- chain the Spark UDF uses (identical coefficients and order)
      ex AS (SELECT z, 1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2))) AS t,
                    abs(z) / sqrt(2) AS x FROM zc),
      ey AS (SELECT z,
                    1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
                      * t - 0.284496736) * t + 0.254829592) * t * exp(-x * x) AS y
             FROM ex)
      SELECT n_nationkey,
             strftime(DATE '2024-03-05', '%B') AS mn,
             date_diff('day', DATE '1858-11-17', DATE '2020-01-01') + n_nationkey AS mjd,
             date_diff('day', DATE '0001-01-01', DATE '2023-09-08') + 366 AS dz,
             CAST(len(list_intersect([n_nationkey + 10, 1, 2],
                                     [2, 3, n_nationkey + 20])) AS DOUBLE)
               / len(list_distinct([n_nationkey + 10, 1, 2] || [2, 3, n_nationkey + 20])) AS jac,
             concat_ws(',',
               CASE WHEN (n_nationkey & 1) = 1 THEN '1' END,
               CASE WHEN (n_nationkey & 2) = 2 THEN '2' END,
               CASE WHEN (n_nationkey & 4) = 4 THEN '4' END,
               CASE WHEN (n_nationkey & 8) = 8 THEN '8' END,
               CASE WHEN (n_nationkey & 16) = 16 THEN '16' END) AS bl,
             regexp_replace('SELECT ' || CAST(n_nationkey AS VARCHAR) || ' FROM t',
                            '\b\d+(\.\d+)?\b', '?', 'g') AS nq,
             CASE WHEN len(string_split('a.b.example.com', '.')) >= 3
                       AND string_split('a.b.example.com', '.')[len(string_split('a.b.example.com', '.')) - 1]
                           IN ('com', 'net', 'org', 'co', 'biz', 'gov', 'mil', 'edu', 'info')
                  THEN string_split('a.b.example.com', '.')[len(string_split('a.b.example.com', '.')) - 2]
                  ELSE string_split('a.b.example.com', '.')[len(string_split('a.b.example.com', '.')) - 1]
             END AS fss,
             CASE WHEN string_split('news.clickhouse.com.tr', '.')[len(string_split('news.clickhouse.com.tr', '.')) - 1]
                       IN ('com', 'net', 'org', 'co', 'biz', 'gov', 'mil', 'edu', 'info')
                  THEN array_to_string(string_split('news.clickhouse.com.tr', '.')[len(string_split('news.clickhouse.com.tr', '.')) - 2:], '.')
                  ELSE array_to_string(string_split('news.clickhouse.com.tr', '.')[len(string_split('news.clickhouse.com.tr', '.')) - 1:], '.')
             END AS ctf,
             (1426860702823350272 >> 22) + 1288834974657 AS snow_ms,
             round(ey.z, 6) AS pz,
             round(2.0 * (1.0 - 0.5 * (1.0 + ey.y)), 6) AS pp
      FROM nation, ey ORDER BY n_nationkey""")),

    // quantileExactLow/High element-exact picks, groupArrayLast's
    // deterministic n-largest reinterpretation, and the sorted-fold
    // deltaSumTimestamp — the oracle recomputes each from the sorted
    // multiset (index arithmetic, tail slice, windowed positive
    // deltas), so the SEMANTICS are checked, not just the values.
    QDef("sql_ch_quantile_picks", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT quantileExactLow(0.25)(n_nationkey) AS qlo,
               quantileExactHigh(0.25)(n_nationkey) AS qhi,
               quantileExactLow(0.5)(n_nationkey) AS mlo,
               quantileExactHigh(0.5)(n_nationkey) AS mhi,
               arrayStringConcat(groupArrayLast(3)(n_nationkey), '|') AS last3,
               deltaSumTimestamp(n_nationkey * 2, n_nationkey) AS dst
        FROM nation WHERE n_nationkey < 24""")
    }, Some("""
      WITH l AS (SELECT list_sort(list(n_nationkey)) AS l,
                        CAST(count(*) AS INT) AS n
                 FROM nation WHERE n_nationkey < 24),
      d AS (SELECT CAST(n_nationkey * 2 AS DOUBLE) AS v, n_nationkey AS t
            FROM nation WHERE n_nationkey < 24),
      w AS (SELECT v - lag(v) OVER (ORDER BY t) AS dv FROM d),
      ds AS (SELECT COALESCE(sum(CASE WHEN dv > 0 THEN dv END), 0.0) AS dst FROM w)
      SELECT l[least(CAST(floor(n * 0.25) AS INT), n - 1) + 1] AS qlo,
             l[least(CAST(floor(n * 0.25) AS INT), n - 1) + 1] AS qhi,
             l[(n // 2) - (CASE WHEN n % 2 = 0 THEN 1 ELSE 0 END) + 1] AS mlo,
             l[(n // 2) + 1] AS mhi,
             array_to_string(l[n - 2:n], '|') AS last3,
             ds.dst AS dst
      FROM l, ds""")),

    // corrMatrix/covarSampMatrix: the k×k one-pass matrix aggregates,
    // checked cell-by-cell via 1-based double subscripts against
    // DuckDB's pairwise corr/covar_samp (scale-free ratios — 4dp per
    // the repo's moments precedent). Catalyst dedups the mirrored
    // cells, so the matrix costs k²/2 moment states, not k².
    QDef("agg_corr_matrix", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT round(corrMatrix(l_quantity, l_extendedprice, l_discount)[1][2], 4) AS r_qp,
               round(corrMatrix(l_quantity, l_extendedprice, l_discount)[1][3], 4) AS r_qd,
               round(corrMatrix(l_quantity, l_extendedprice, l_discount)[2][3], 4) AS r_pd,
               round(covarSampMatrix(l_quantity, l_discount)[1][2], 4) AS cv_qd
        FROM lineitem""")
    }, Some("""
      SELECT round(corr(l_quantity, l_extendedprice), 4) AS r_qp,
             round(corr(l_quantity, l_discount), 4) AS r_qd,
             round(corr(l_extendedprice, l_discount), 4) AS r_pd,
             round(covar_samp(l_quantity, l_discount), 4) AS cv_qd
      FROM lineitem""")),

    // groupArrayIntersect: per-group intersection of array values —
    // the oracle recomputes it relationally (an element is in the
    // intersection iff it appears in every row of the group), so the
    // fold semantics are checked, not echoed.
    QDef("agg_group_array_intersect", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey,
               arrayStringConcat(arrayMap(x -> toString(x),
                 groupArrayIntersect(array(n_nationkey % 5, 3, 4))), '|') AS common
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
    }, Some("""
      WITH a AS (SELECT n_regionkey, n_nationkey,
                        list_distinct([n_nationkey % 5, 3, 4]) AS arr
                 FROM nation),
      g AS (SELECT n_regionkey, count(*) AS n FROM a GROUP BY n_regionkey),
      e AS (SELECT n_regionkey, unnest(arr) AS el FROM a),
      common AS (
        SELECT e.n_regionkey, e.el
        FROM e JOIN g USING (n_regionkey)
        GROUP BY e.n_regionkey, e.el, g.n
        HAVING count(*) = g.n)
      SELECT g.n_regionkey,
             coalesce(array_to_string(list_sort(list(common.el)), '|'), '') AS common
      FROM g LEFT JOIN common ON g.n_regionkey = common.n_regionkey
      GROUP BY g.n_regionkey ORDER BY g.n_regionkey""")),

    // Wave-12/13 scalars: half-open range(), arrayWithConstant,
    // countDigits, 64-bit byteSwap (the oracle spells out all eight
    // byte moves), calendar helpers, and the Tukey outlier scores
    // (DuckDB recomputes quartile fences via quantile_cont — the same
    // linear interpolation the UDF uses — over the per-row series).
    QDef("sql_ch_w12_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey,
               arrayStringConcat(arrayMap(x -> toString(x),
                 range(n_nationkey % 4)), '|') AS rng,
               arrayStringConcat(arrayMap(x -> toString(x),
                 arrayWithConstant(3, n_nationkey)), '|') AS awc,
               countDigits(n_nationkey * 137 + 1) AS cd,
               byteSwap(n_nationkey) AS bs,
               monthName(toDate('2024-03-05')) AS mn,
               dateTrunc('month', toDate('2024-03-15')) AS dt,
               round(arraySum(seriesOutliersDetectTukey(
                 [1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 3.0,
                  CAST(n_nationkey * 50 AS Float64)])), 4) AS tukey_sum
        FROM nation ORDER BY n_nationkey""")
    }, Some("""
      WITH t AS (
        SELECT n_nationkey,
               unnest([1.0, 2.0, 3.0, 2.0, 1.0, 2.0, 3.0,
                       CAST(n_nationkey * 50 AS DOUBLE)]) AS v
        FROM nation),
      q AS (SELECT n_nationkey,
                   quantile_cont(v, 0.25) AS q1, quantile_cont(v, 0.75) AS q3
            FROM t GROUP BY n_nationkey),
      sc AS (
        SELECT t.n_nationkey,
               round(sum(CASE
                 WHEN v < q1 - 1.5 * (q3 - q1) THEN v - (q1 - 1.5 * (q3 - q1))
                 WHEN v > q3 + 1.5 * (q3 - q1) THEN v - (q3 + 1.5 * (q3 - q1))
                 ELSE 0.0 END), 4) AS tukey_sum
        FROM t JOIN q USING (n_nationkey) GROUP BY t.n_nationkey)
      SELECT n.n_nationkey,
             CASE WHEN n.n_nationkey % 4 = 0 THEN ''
                  ELSE array_to_string(list_transform(
                    generate_series(0, n.n_nationkey % 4 - 1),
                    x -> CAST(x AS VARCHAR)), '|') END AS rng,
             array_to_string([CAST(n.n_nationkey AS VARCHAR),
                              CAST(n.n_nationkey AS VARCHAR),
                              CAST(n.n_nationkey AS VARCHAR)], '|') AS awc,
             length(CAST(n.n_nationkey * 137 + 1 AS VARCHAR)) AS cd,
             (((CAST(n.n_nationkey AS BIGINT) >> 0)  & 255) << 56) |
             (((CAST(n.n_nationkey AS BIGINT) >> 8)  & 255) << 48) |
             (((CAST(n.n_nationkey AS BIGINT) >> 16) & 255) << 40) |
             (((CAST(n.n_nationkey AS BIGINT) >> 24) & 255) << 32) |
             (((CAST(n.n_nationkey AS BIGINT) >> 32) & 255) << 24) |
             (((CAST(n.n_nationkey AS BIGINT) >> 40) & 255) << 16) |
             (((CAST(n.n_nationkey AS BIGINT) >> 48) & 255) << 8) |
             ((CAST(n.n_nationkey AS BIGINT) >> 56)  & 255) AS bs,
             strftime(DATE '2024-03-05', '%B') AS mn,
             CAST(date_trunc('month', DATE '2024-03-15') AS TIMESTAMP) AS dt,
             sc.tukey_sum
      FROM nation n JOIN sc ON n.n_nationkey = sc.n_nationkey
      ORDER BY n.n_nationkey""")),

    // Multi-item ARRAY JOIN (the CH zip idiom `arr AS a,
    // arrayEnumerate(arr) AS i`): one positional explode + indexed
    // companions, checked against a relational grid recomputation.
    QDef("sql_ch_array_join_zip", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey, a, i
        FROM (SELECT n_nationkey, [n_nationkey + 100, n_nationkey * 2] AS arr
              FROM nation WHERE n_nationkey < 5)
        ARRAY JOIN arr AS a, arrayEnumerate(arr) AS i
        ORDER BY n_nationkey, i""")
    }, Some("""
      SELECT n_nationkey,
             CASE WHEN s.i = 1 THEN n_nationkey + 100
                  ELSE n_nationkey * 2 END AS a,
             CAST(s.i AS INT) AS i
      FROM nation, (SELECT unnest(generate_series(1, 2)) AS i) s
      WHERE n_nationkey < 5
      ORDER BY n_nationkey, i""")),

    // javaHash/hiveHash proven by an INDEPENDENT DuckDB fold (h·31+c
    // with explicit 32-bit signed wrap over the code points), plus
    // singleValueOrNull's unique-or-NULL contract and the
    // PERCENTILE.EXC rank arithmetic, all per region group.
    QDef("sql_ch_w13_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey,
               singleValueOrNull(n_nationkey % 1) AS sv_one,
               singleValueOrNull(n_nationkey) AS sv_many,
               round(quantileExactExclusive(0.3)(n_nationkey), 4) AS qexc,
               min(javaHash(n_name)) AS jh_min,
               max(hiveHash(n_name)) AS hh_max
        FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""")
    }, Some("""
      WITH jh AS (
        SELECT n_regionkey, n_nationkey,
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(string_split(n_name, ''),
                                c -> CAST(unicode(c) AS BIGINT))),
                 (a, b) -> ((a * 31 + b + 2147483648) % 4294967296
                            + 4294967296) % 4294967296 - 2147483648) AS h
        FROM nation),
      g AS (
        SELECT n_regionkey,
               list_sort(list(n_nationkey)) AS l, count(*) AS n,
               CASE WHEN count(DISTINCT n_nationkey % 1) = 1
                    THEN min(n_nationkey % 1) END AS sv_one,
               CASE WHEN count(DISTINCT n_nationkey) = 1
                    THEN min(n_nationkey) END AS sv_many,
               CAST(min(h) AS INT) AS jh_min,
               CAST(max(h & 2147483647) AS INT) AS hh_max
        FROM jh GROUP BY n_regionkey)
      SELECT n_regionkey, sv_one, sv_many,
             round(l[CAST(floor(greatest(least(0.3 * (n + 1), CAST(n AS DOUBLE)), 1.0)) AS INT)]
                   + (greatest(least(0.3 * (n + 1), CAST(n AS DOUBLE)), 1.0)
                      - CAST(floor(greatest(least(0.3 * (n + 1), CAST(n AS DOUBLE)), 1.0)) AS INT))
                   * (l[least(CAST(floor(greatest(least(0.3 * (n + 1), CAST(n AS DOUBLE)), 1.0)) AS INT) + 1, CAST(n AS INT))]
                      - l[CAST(floor(greatest(least(0.3 * (n + 1), CAST(n AS DOUBLE)), 1.0)) AS INT)]),
                   4) AS qexc,
             jh_min, hh_max
      FROM g ORDER BY n_regionkey""")),

    // merge('regexp') — CH's multi-table union view with the `_table`
    // virtual column, over two same-schema splits of orders; plus
    // formatRow rendering checked against DuckDB's own JSON/CSV
    // string building. The union stays a plain UNION ALL of pruned
    // scans — no shuffle beyond the downstream aggregate.
    QDef("sql_ch_merge_tf", (s, dir) => {
      Graft.init(s, dir)
      val o = Tables(s, dir, "orders")
      o.filter(o("o_orderkey") % 2 === 0).createOrReplaceTempView("graft_ord_even")
      o.filter(o("o_orderkey") % 2 === 1).createOrReplaceTempView("graft_ord_odd")
      Graft.sql(s, """
        SELECT _table, c,
               formatRowNoNewline('JSONEachRow', lo) AS j,
               formatRowNoNewline('CSV', c, lo) AS csv
        FROM (SELECT _table, count() AS c, min(o_orderkey) AS lo
              FROM merge('^graft_ord_(even|odd)$')
              GROUP BY _table)
        ORDER BY _table""")
    }, Some("""
      WITH u AS (
        SELECT 'graft_ord_even' AS _table, o_orderkey FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL
        SELECT 'graft_ord_odd' AS _table, o_orderkey FROM orders WHERE o_orderkey % 2 = 1)
      SELECT _table, count(*) AS c,
             '{"lo":' || CAST(min(o_orderkey) AS VARCHAR) || '}' AS j,
             CAST(count(*) AS VARCHAR) || ',' || CAST(min(o_orderkey) AS VARCHAR) AS csv
      FROM u GROUP BY _table ORDER BY _table""")),

    // Wave-11 scalars: mapPopulateSeries gap-filling (element-picked —
    // the oracle recomputes the gap/hit cases), timeSlots slot counts
    // (floor arithmetic on the epoch), arbitrary-p Lp norms/distances
    // (identical fold order, 4dp for cross-libm pow), and the
    // arrayShuffle permutation law (sort∘shuffle = sort).
    QDef("sql_ch_w11_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey,
               mapPopulateSeries([1, n_nationkey % 3 + 2], [10, 20])[2] AS mp,
               size(timeSlots(toDateTime('2024-03-05 10:17:00'),
                              CAST(n_nationkey * 400 AS Int64))) AS nslots,
               round(LpNorm([CAST(n_nationkey AS Float64), 3.0], 3), 4) AS lp3,
               round(LpDistance([1.0, 2.0],
                                [CAST(n_nationkey AS Float64), 6.0], 2.5), 4) AS lpd,
               arrayStringConcat(arrayMap(x -> toString(x),
                 arraySort(arrayShuffle([n_nationkey + 10, 1, 2], 5))), '|') AS perm
        FROM nation ORDER BY n_nationkey""")
    }, Some("""
      SELECT n_nationkey,
             CASE WHEN n_nationkey % 3 + 2 = 2 THEN 20 ELSE 0 END AS mp,
             CAST(floor((epoch(TIMESTAMP '2024-03-05 10:17:00')
                         + n_nationkey * 400) / 1800)
                  - floor(epoch(TIMESTAMP '2024-03-05 10:17:00') / 1800)
                  + 1 AS INT) AS nslots,
             round(pow(pow(abs(CAST(n_nationkey AS DOUBLE)), 3) + pow(3.0, 3),
                       1.0 / 3), 4) AS lp3,
             round(pow(pow(abs(1.0 - CAST(n_nationkey AS DOUBLE)), 2.5)
                       + pow(abs(2.0 - 6.0), 2.5), 1.0 / 2.5), 4) AS lpd,
             array_to_string(list_transform(list_sort([n_nationkey + 10, 1, 2]),
                                            x -> CAST(x AS VARCHAR)), '|') AS perm
      FROM nation ORDER BY n_nationkey""")),

    // Wave-14: GRADUATION of load-bearing probed-only spellings into
    // the oracle gate (r7 verdict item 4) — interval arithmetic,
    // tuple IN (literal list AND subquery), correlated EXISTS,
    // caseWithExpression/multiIf, the numbers(start, count) and
    // VALUES('schema', …) table-function argument forms, 3-arg
    // position, || concat, IS NOT DISTINCT FROM, intDivOrZero/
    // moduloOrZero, BETWEEN, and a trailing comma before FROM. The
    // DuckDB side recomputes each semantic with its own primitives
    // (CASE dispatch, EXISTS rewrites of tuple-IN, range(), instr
    // offset arithmetic) — these can no longer regress silently
    // behind a rows-only probe.
    QDef("sql_ch_w14_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey AS k,
               caseWithExpression(n_regionkey, 0, 'africa', 1, 'america', 'other') AS cwe,
               multiIf(n_regionkey = 0, 'africa', n_regionkey = 1, 'america', 'other') AS mi,
               toString(toDate('2024-01-10') + INTERVAL 3 DAY) AS d1,
               toUnixTimestamp(toDateTime('2024-03-05 07:08:09') - INTERVAL 90 MINUTE) AS t1,
               (n_regionkey, n_nationkey) IN ((0, 0), (1, 1)) AS tin,
               (SELECT count() FROM nation
                 WHERE (n_regionkey, n_nationkey)
                       IN (SELECT r_regionkey, r_regionkey FROM region)) AS tins,
               (SELECT count() FROM region
                 WHERE EXISTS (SELECT 1 FROM nation n2
                                WHERE n2.n_regionkey = r_regionkey
                                  AND n2.n_nationkey > 20)) AS exc,
               (SELECT sum(number) FROM numbers(10, 5)) AS nsum,
               (SELECT count() FROM VALUES('a UInt8, s String',
                  (1, 'x'), (2, 'y'), (3, 'z')) WHERE a > 1) AS vcnt,
               CAST(position('hello', 'l', 4) AS Int64) AS p3,
               'x' || '-' || n_name AS cc,
               NULL IS NOT DISTINCT FROM NULL AS ind,
               CAST(intDivOrZero(n_nationkey, n_regionkey) AS Int64) AS idz,
               CAST(moduloOrZero(n_nationkey, n_regionkey) AS Int64) AS mdz,
               n_nationkey BETWEEN 3 AND 7 AS btw,
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
             CASE n_regionkey WHEN 0 THEN 'africa' WHEN 1 THEN 'america'
                  ELSE 'other' END AS cwe,
             CASE WHEN n_regionkey = 0 THEN 'africa'
                  WHEN n_regionkey = 1 THEN 'america' ELSE 'other' END AS mi,
             CAST(CAST(DATE '2024-01-10' + INTERVAL 3 DAY AS DATE) AS VARCHAR) AS d1,
             CAST(epoch(TIMESTAMP '2024-03-05 07:08:09' - INTERVAL 90 MINUTE) AS BIGINT) AS t1,
             ((n_regionkey = 0 AND n_nationkey = 0)
              OR (n_regionkey = 1 AND n_nationkey = 1)) AS tin,
             (SELECT count(*) FROM nation n3
               WHERE EXISTS (SELECT 1 FROM region r2
                              WHERE r2.r_regionkey = n3.n_regionkey
                                AND r2.r_regionkey = n3.n_nationkey)) AS tins,
             (SELECT count(*) FROM region r3
               WHERE EXISTS (SELECT 1 FROM nation n2
                              WHERE n2.n_regionkey = r3.r_regionkey
                                AND n2.n_nationkey > 20)) AS exc,
             (SELECT CAST(sum(x) AS BIGINT) FROM range(10, 15) t(x)) AS nsum,
             (SELECT count(*) FROM (VALUES (1), (2), (3)) v(a) WHERE a > 1) AS vcnt,
             CAST(CASE WHEN instr(substring('hello', 4), 'l') = 0 THEN 0
                       ELSE instr(substring('hello', 4), 'l') + 3 END AS BIGINT) AS p3,
             'x' || '-' || n_name AS cc,
             (NULL IS NOT DISTINCT FROM NULL) AS ind,
             CAST(CASE WHEN n_regionkey = 0 THEN 0
                       ELSE n_nationkey // n_regionkey END AS BIGINT) AS idz,
             CAST(CASE WHEN n_regionkey = 0 THEN 0
                       ELSE n_nationkey % n_regionkey END AS BIGINT) AS mdz,
             (n_nationkey BETWEEN 3 AND 7) AS btw
      FROM nation ORDER BY k""")),

    // WITH RECURSIVE (CH 24.4+): ancestor closure over an implicit
    // tree (parent(n) = (n−1) div 3) — anchor = every nation node,
    // recursive step walks one level up until the root. Spark 4's
    // native UnionLoop executes the iteration (each level is one
    // distributed step; spark.sql.cteRecursionLevelLimit bounds
    // runaway recursion with a loud error — spec-pinned), and the
    // oracle is DuckDB's OWN native WITH RECURSIVE, so the fixed
    // point itself is cross-checked, not just the final aggregate
    // shape. CH dialect inside the recursive member (intDiv, count())
    // proves the front door's rewrites reach recursive CTE bodies.
    QDef("sql_ch_recursive", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        WITH RECURSIVE anc AS (
          SELECT CAST(n_nationkey AS Int64) AS node,
                 CAST(n_nationkey AS Int64) AS anc,
                 0 AS depth
          FROM nation
          UNION ALL
          SELECT a.node, CAST(intDiv(a.anc - 1, 3) AS Int64) AS anc,
                 a.depth + 1 AS depth
          FROM anc a WHERE a.anc > 0
        )
        SELECT node, count() AS n_anc, max(depth) AS d,
               CAST(min(anc) AS Int64) AS root
        FROM anc GROUP BY node ORDER BY node""")
    }, Some("""
      WITH RECURSIVE anc AS (
        SELECT CAST(n_nationkey AS BIGINT) AS node,
               CAST(n_nationkey AS BIGINT) AS anc,
               0 AS depth
        FROM nation
        UNION ALL
        SELECT a.node, CAST((a.anc - 1) // 3 AS BIGINT) AS anc,
               a.depth + 1 AS depth
        FROM anc a WHERE a.anc > 0
      )
      SELECT node, count(*) AS n_anc, max(depth) AS d,
             CAST(min(anc) AS BIGINT) AS root
      FROM anc GROUP BY node ORDER BY node""")),

    // Wave-15 graduation: map algebra (mapAdd key-union arithmetic,
    // mapSort), moving group arrays (whole-window + parametric
    // window, both over the SORTED multiset — deterministic
    // reinterpretation of CH's block order), arrayShiftRight,
    // greatCircleAngle, extractGroups, 1-arg JSONType, roundBankers,
    // widthBucket, toYYYYMMDDhhmmss. The oracle recomputes each from
    // DuckDB primitives (prefix-sum slices, trig identity, parity
    // arithmetic for banker's rounding, floor bucketing).
    QDef("sql_ch_w15_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          arrayStringConcat(arrayMap(x -> toString(x),
            groupArrayMovingSum(n_nationkey)), '|') AS ms,
          arrayStringConcat(arrayMap(x -> toString(x),
            groupArrayMovingSum(3)(n_nationkey)), '|') AS ms3,
          arrayStringConcat(arrayMap(x -> toString(round(x, 4)),
            groupArrayMovingAvg(toFloat64(n_nationkey))), '|') AS mavg,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            mapValues(mapSort(mapAdd(map('b', n_regionkey, 'a', 1),
                                     map('a', 10, 'c', 2))))), '|')) AS ma,
          min(arrayStringConcat(mapKeys(mapSort(
            mapAdd(map('b', n_regionkey, 'a', 1),
                   map('a', 10, 'c', 2)))), '|')) AS mk,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            arrayShiftRight([n_regionkey, 7], 1)), '|')) AS sr,
          round(min(greatCircleAngle(0.0, 0.0,
            toFloat64(n_regionkey * 10), 0.0)), 4) AS gca,
          min(arrayStringConcat(extractGroups(
            concat('r=', toString(n_regionkey)), '([a-z])=([0-9]+)'), '|')) AS eg,
          min(JSONType(concat('{"a":', toString(n_regionkey), '}'))) AS jt,
          min(JSONType(toString(n_regionkey))) AS jn,
          min(CAST(roundBankers(toFloat64(n_regionkey) + 0.5) AS Int64)) AS rb,
          min(CAST(widthBucket(toFloat64(n_nationkey), 0.0, 25.0, 5) AS Int64)) AS wb,
          min(toYYYYMMDDhhmmss(toDateTime('2024-03-05 07:08:09'))) AS ts
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      WITH g AS (SELECT n_regionkey, list_sort(list(n_nationkey)) AS l,
                        CAST(count(*) AS INT) AS n,
                        min(n_nationkey) AS min_nk
                 FROM nation GROUP BY 1)
      SELECT n_regionkey AS k,
        array_to_string(list_transform(range(1, n + 1),
          i -> CAST(CAST(list_sum(l[1:i]) AS BIGINT) AS VARCHAR)), '|') AS ms,
        array_to_string(list_transform(range(1, n + 1),
          i -> CAST(CAST(list_sum(l[greatest(1, i - 2):i]) AS BIGINT)
                    AS VARCHAR)), '|') AS ms3,
        array_to_string(list_transform(range(1, n + 1),
          i -> CAST(round(CAST(list_sum(l[1:i]) AS DOUBLE) / n, 4)
                    AS VARCHAR)), '|') AS mavg,
        '11|' || CAST(n_regionkey AS VARCHAR) || '|2' AS ma,
        'a|b|c' AS mk,
        '0|' || CAST(n_regionkey AS VARCHAR) AS sr,
        round(degrees(2 * asin(abs(sin(
          radians(CAST(n_regionkey * 10 AS DOUBLE)) / 2)))), 4) AS gca,
        'r|' || CAST(n_regionkey AS VARCHAR) AS eg,
        'Object' AS jt,
        'Int64' AS jn,
        CAST(n_regionkey + (n_regionkey % 2) AS BIGINT) AS rb,
        CAST(floor(CAST(min_nk AS DOUBLE) / 5) + 1 AS BIGINT) AS wb,
        CAST(strftime(TIMESTAMP '2024-03-05 07:08:09',
                      '%Y%m%d%H%M%S') AS BIGINT) AS ts
      FROM g ORDER BY k""")),

    // Wave-16 graduation: the CH ternary operator (single + chained —
    // right-associativity pinned by the chain), timezone rendering
    // (toTimeZone/2-arg toString — plan-constant here, recomputed as
    // constants oracle-side), 2-arg arrayResize, bitTest family,
    // toIntervalWeek date arithmetic, polymorphic length on maps and
    // BYTE semantics on strings (CH: length = bytes, lengthUTF8 =
    // code points), negative array subscripts.
    QDef("sql_ch_w16_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey AS k,
          n_regionkey = 0 ? 'africa' : concat('r', toString(n_regionkey)) AS tern,
          n_regionkey = 0 ? 1 : n_regionkey = 1 ? 2 : 3 AS tern_chain,
          toHour(toTimeZone(toDateTime('2024-03-05 12:00:00'), 'Asia/Tokyo')) AS tz_h,
          toString(toDateTime('2024-03-05 12:00:00'), 'America/New_York') AS tz_s,
          arrayStringConcat(arrayMap(x -> toString(x),
            arrayResize([n_regionkey, 5], 4)), '|') AS rz,
          CAST(bitTest(n_nationkey, 1) AS Int64) AS bt,
          bitTestAll(n_nationkey, 0, 1) AS bta,
          toString(toDate(toDate('2024-01-01') + toIntervalWeek(n_regionkey))) AS wk,
          CAST(length(map('a', 1, 'b', n_regionkey)) AS Int64) AS ml,
          CAST(length('héllo') AS Int64) AS bytes_len,
          CAST(lengthUTF8('héllo') AS Int64) AS char_len,
          [10, 20, 30][-1] AS neg
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
        CASE WHEN n_regionkey = 0 THEN 'africa'
             ELSE 'r' || CAST(n_regionkey AS VARCHAR) END AS tern,
        CASE WHEN n_regionkey = 0 THEN 1
             WHEN n_regionkey = 1 THEN 2 ELSE 3 END AS tern_chain,
        hour(timezone('Asia/Tokyo',
          timezone('UTC', TIMESTAMP '2024-03-05 12:00:00'))) AS tz_h,
        strftime(timezone('America/New_York',
          timezone('UTC', TIMESTAMP '2024-03-05 12:00:00')),
          '%Y-%m-%d %H:%M:%S') AS tz_s,
        CAST(n_regionkey AS VARCHAR) || '|5|0|0' AS rz,
        CAST((n_nationkey // 2) % 2 AS BIGINT) AS bt,
        (n_nationkey % 4) = 3 AS bta,
        CAST(DATE '2024-01-01' + n_regionkey * 7 AS VARCHAR) AS wk,
        CAST(2 AS BIGINT) AS ml,
        CAST(strlen('héllo') AS BIGINT) AS bytes_len,
        CAST(length('héllo') AS BIGINT) AS char_len,
        30 AS neg
      FROM nation ORDER BY k""")),

    // WITH FILL … STALENESS (CH 23.12+): filler rows trail each
    // ORIGINAL row at the STEP stride only while their distance stays
    // under the staleness bound, and never reach the next original
    // row — no global grid. The oracle regenerates the trailing
    // points per original row with lead() + an exclusive range().
    QDef("sql_ch_fill_staleness", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey * 3 AS x, count() AS c
        FROM nation WHERE n_nationkey % 4 = 0
        GROUP BY x
        ORDER BY x WITH FILL STEP 5 STALENESS 11""")
    }, Some("""
      WITH o AS (SELECT n_nationkey * 3 AS x, count(*) AS c
                 FROM nation WHERE n_nationkey % 4 = 0 GROUP BY 1),
      n AS (SELECT x, c, lead(x) OVER (ORDER BY x) AS nx FROM o),
      gen AS (SELECT unnest(range(x + 5, least(x + 11, coalesce(nx, x + 11)),
                                  5)) AS x,
                     CAST(0 AS BIGINT) AS c
              FROM n)
      SELECT CAST(x AS INT) AS x, c FROM
        (SELECT x, c FROM o UNION ALL SELECT x, c FROM gen)
      ORDER BY x""")),

    // Absolute SAMPLE n (row-count form): the n hash-smallest rows by
    // the registered sampling key — exactly n rows, deterministic at
    // any parallelism (TakeOrdered). The oracle reproduces the same
    // md5-hash ordering and aggregates over the same subset.
    QDef("sql_ch_sample_n", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT count() AS c,
               CAST(sum(o_orderkey) AS Int64) AS sk,
               min(o_orderkey) AS lo
        FROM orders SAMPLE 500""")
    }, Some("""
      WITH smp AS (
        SELECT o_orderkey
        FROM orders
        ORDER BY CAST('0x' || substring(md5('smp|' ||
                   CAST(o_orderkey AS VARCHAR)), 1, 15) AS BIGINT),
                 o_orderkey
        LIMIT 500)
      SELECT count(*) AS c, CAST(sum(o_orderkey) AS BIGINT) AS sk,
             min(o_orderkey) AS lo
      FROM smp""")),

    // Absolute SAMPLE n ABOVE the approx threshold (n=20000 >
    // sampleNApproxThreshold=10000): the scale path — a
    // hash-threshold scan filter with cutoff ceil(2^60·n/count(*))
    // from one scalar-subquery count; NO TakeOrdered, no global sort
    // (the small-n exact path's driver merge grows with n). Row count
    // is ~n (CH's own "approximately n rows" contract): at sf0.01
    // lineitem has 60k rows so the filter keeps ≈ a third; at sf0.001
    // (6k rows) n > count and the cutoff passes everything — both
    // legs hash-match because the oracle derives the identical cutoff
    // from the identical text.
    QDef("sql_ch_sample_n_large", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT count() AS c,
               sum(CAST(l_quantity AS Int64)) AS sq,
               CAST(min(l_orderkey) AS Int64) AS lo
        FROM lineitem SAMPLE 20000""")
    }, Some("""
      SELECT count(*) AS c,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
             CAST(min(l_orderkey) AS BIGINT) AS lo
      FROM lineitem
      WHERE CAST('0x' || substring(md5('smp|' ||
              CAST(l_orderkey AS VARCHAR)), 1, 15) AS BIGINT)
            < (SELECT CAST(ceil(1152921504606846976e0 * 20000
                 / count(*)) AS BIGINT) FROM lineitem)""")),

    // Wave-24 graduation: arraySplit/arrayReverseSplit (cut-before vs
    // cut-after flag semantics, pinned by segment counts + the
    // flatten-identity), arrayZipUnaligned null padding, UTF8
    // predicate spellings, form-style URL encoding, hasSubsequence
    // (restated as an any-gap regex oracle), and groupArraySample —
    // the deterministic md5-hash-order sample the oracle reproduces
    // byte-for-byte.
    QDef("sql_ch_w24_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          CAST(size(arraySplit(x -> x = 1,
            [min(n_nationkey) % 2, 1, 0])) AS Int64) AS fwd_n,
          CAST(size(arrayReverseSplit(x -> x = 1,
            [min(n_nationkey) % 2, 1, 0])) AS Int64) AS rev_n,
          arrayStringConcat(arrayMap(x -> toString(x),
            arrayFlatten(arrayReverseSplit(x -> x = 1,
              [min(n_nationkey) % 2, 1, 0]))), ',') AS flat_id,
          arrayStringConcat(arrayMap(t ->
              concat(toString(t.1), ':', ifNull(toString(t.2), 'null')),
            arrayZipUnaligned([CAST(n_regionkey AS Int64), 7],
                              [CAST(min(n_nationkey) AS Int64)])), '|') AS zu,
          CAST(sum(CAST(startsWithUTF8(n_name, 'NATION') AS Int8)) AS Int64) AS sw,
          CAST(sum(CAST(endsWithUTF8(n_name, '1') AS Int8)) AS Int64) AS ew,
          min(encodeURLFormComponent(concat(n_name, ' x'))) AS uf,
          CAST(sum(CAST(hasSubsequence(n_name, 'NTO') AS Int8)) AS Int64) AS hs,
          arrayStringConcat(arrayMap(x -> toString(x),
            groupArraySample(3, 42)(n_nationkey)), '|') AS gs
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      WITH h AS (
        SELECT n_regionkey AS k, n_nationkey AS v, n_name,
               CAST('0x' || substring(md5('gas|42|' ||
                 CAST(n_nationkey AS VARCHAR)), 1, 15) AS BIGINT) AS hv
        FROM nation),
      samp AS (
        SELECT k, list(v ORDER BY hv, v)[1:3] AS sv
        FROM h GROUP BY k)
      SELECT k,
        2 AS fwd_n,
        2 + min(v) % 2 AS rev_n,
        CAST(min(v) % 2 AS VARCHAR) || ',1,0' AS flat_id,
        CAST(k AS VARCHAR) || ':' || CAST(min(v) AS VARCHAR)
          || '|7:null' AS zu,
        CAST(count(*) FILTER (WHERE n_name LIKE 'NATION%') AS BIGINT) AS sw,
        CAST(count(*) FILTER (WHERE n_name LIKE '%1') AS BIGINT) AS ew,
        replace(min(n_name) || ' x', ' ', '+') AS uf,
        CAST(count(*) FILTER (WHERE regexp_matches(n_name, 'N.*T.*O'))
             AS BIGINT) AS hs,
        (SELECT array_to_string(list_transform(sv,
             x -> CAST(x AS VARCHAR)), '|')
         FROM samp WHERE samp.k = h.k) AS gs
      FROM h GROUP BY k ORDER BY k""")),

    // Wave-25 graduation: the two-sample test aggregate SPELLINGS
    // (welchTTest/studentTTest/meanZTest over (sample, index)) — the
    // statistics are re-derived in DuckDB from the same decimal-sum
    // moments; the p-value/CI halves are pinned by t-table known
    // answers in ChDialectSpec (DuckDB has no erfc/betainc).
    QDef("sql_ch_w25_ttests", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT
          round(tupleElement(welchTTest(toFloat64(l_quantity),
                                        l_linenumber % 2), 1), 4) AS wt,
          round(tupleElement(studentTTest(toFloat64(l_quantity),
                                          l_linenumber % 2), 1), 4) AS st,
          round(tupleElement(meanZTest(208.0, 208.0, 0.95)(
            toFloat64(l_quantity), l_linenumber % 2), 1), 4) AS z
        FROM lineitem""")
    }, Some("""
      WITH st AS (
        SELECT (l_linenumber % 2) AS i,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(22,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)
                             AS DECIMAL(22,6))) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY 1),
      m AS (SELECT i, n, sx / n AS m, (sxx - sx * sx / n) / (n - 1) AS v
            FROM st),
      ab AS (SELECT a.n AS n0, a.m AS m0, a.v AS v0,
                    b.n AS n1, b.m AS m1, b.v AS v1
             FROM (SELECT * FROM m WHERE i = 0) a,
                  (SELECT * FROM m WHERE i = 1) b)
      SELECT
        round((m0 - m1) / sqrt(v0 / n0 + v1 / n1), 4) AS wt,
        round((m0 - m1) / sqrt((((n0 - 1) * v0 + (n1 - 1) * v1)
              / (n0 + n1 - 2)) * (1 / n0 + 1 / n1)), 4) AS st,
        round((m0 - m1) / sqrt(208.0 / n0 + 208.0 / n1), 4) AS z
      FROM ab""")),

    // groupBitmapAnd/Or/Xor over per-row bitmaps: the oracle re-derives
    // the three cardinalities from first principles via unnest —
    // union = distinct values, intersection = values present in EVERY
    // row, xor = values present in an ODD number of rows.
    QDef("sql_ch_group_bitmap_ops", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          CAST(groupBitmapOr(bitmapBuild([n_nationkey % 7, 3])) AS Int64) AS o,
          CAST(groupBitmapAnd(bitmapBuild([n_nationkey % 7, 3])) AS Int64) AS a,
          CAST(groupBitmapXor(bitmapBuild(
            [CAST(n_nationkey AS Int64), 99])) AS Int64) AS x
        FROM nation GROUP BY k ORDER BY k""")
    }, Some("""
      WITH rows_ AS (
        SELECT n_regionkey AS k, n_nationkey AS rid,
               list_distinct([n_nationkey % 7, 3]) AS bm,
               list_distinct([CAST(n_nationkey AS BIGINT), 99]) AS bx
        FROM nation),
      n_rows AS (SELECT k, count(*) AS nr FROM rows_ GROUP BY k),
      u AS (SELECT k, rid, unnest(bm) AS v FROM rows_),
      ux AS (SELECT k, rid, unnest(bx) AS v FROM rows_),
      o_ AS (SELECT k, count(DISTINCT v) AS o FROM u GROUP BY k),
      a_ AS (SELECT u.k, count(*) AS a FROM
               (SELECT k, v, count(DISTINCT rid) AS c FROM u GROUP BY k, v) u
             JOIN n_rows USING (k) WHERE u.c = n_rows.nr GROUP BY u.k),
      x_ AS (SELECT k, count(*) AS x FROM
               (SELECT k, v, count(DISTINCT rid) AS c FROM ux GROUP BY k, v)
             WHERE c % 2 = 1 GROUP BY k)
      SELECT k, CAST(o AS BIGINT) AS o,
             CAST(coalesce(a, 0) AS BIGINT) AS a,
             CAST(coalesce(x, 0) AS BIGINT) AS x
      FROM o_ LEFT JOIN a_ USING (k) LEFT JOIN x_ USING (k)
      ORDER BY k""")),

    // Wave-26 graduation: the last straggler spellings —
    // JSONExtractUInt, concatAssumeInjective (hint name, concat
    // semantics), regexpExtract with group index, the Joda-syntax
    // datetime formatters (pattern letters coincide for the CH-doc'd
    // symbols), and the log1p/log2 passthroughs.
    QDef("sql_ch_w26_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey AS k,
          JSONExtractUInt(concat('{"v": ', toString(n_nationkey), '}'), 'v') AS ju,
          concatAssumeInjective(n_name, toString(n_regionkey)) AS ci,
          regexpExtract(n_name, '([0-9]+)') AS re1,
          regexpExtract(concat(n_name, ':', toString(n_regionkey)),
                        '([A-Z_]+)([0-9]+)', 2) AS re2,
          formatDateTimeInJodaSyntax(
            addMinutes(toDateTime('2024-03-05 12:00:00'), n_nationkey),
            'yyyy/MM/dd HH:mm') AS fj,
          fromUnixTimestampInJodaSyntax(1709640000 + n_nationkey * 60,
                                        'yyyy-MM-dd HH:mm') AS uj,
          round(log1p(toFloat64(n_nationkey)), 6) AS l1,
          round(log2(toFloat64(n_nationkey) + 1), 6) AS l2
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
        CAST(n_nationkey AS BIGINT) AS ju,
        n_name || CAST(n_regionkey AS VARCHAR) AS ci,
        coalesce(regexp_extract(n_name, '([0-9]+)', 1), '') AS re1,
        coalesce(regexp_extract(n_name || ':' || CAST(n_regionkey AS VARCHAR),
                                '([A-Z_]+)([0-9]+)', 2), '') AS re2,
        strftime(TIMESTAMP '2024-03-05 12:00:00'
                 + n_nationkey * INTERVAL 1 MINUTE, '%Y/%m/%d %H:%M') AS fj,
        strftime(make_timestamp(CAST(1709640000 + n_nationkey * 60 AS BIGINT)
                                * 1000000),
                 '%Y-%m-%d %H:%M') AS uj,
        round(ln(1 + CAST(n_nationkey AS DOUBLE)), 6) AS l1,
        round(log2(CAST(n_nationkey AS DOUBLE) + 1), 6) AS l2
      FROM nation ORDER BY k""")),

    // mannWhitneyUTest SPELLING (collected-state UDAF): the U
    // statistic hash-matches the oracle's exact average-rank algebra
    // (the same SQL the relational agg_mann_whitney entry proves);
    // the p-value half is pinned against the tie-corrected z in
    // ChDialectSpec (DuckDB has no erf).
    QDef("sql_ch_w25_mwu", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT round(tupleElement(mannWhitneyUTest(x, i), 1), 1) AS u_stat
        FROM (SELECT toFloat64(l_quantity) AS x,
                     CASE WHEN l_returnflag = 'A' THEN 0 ELSE 1 END AS i
              FROM lineitem WHERE l_returnflag IN ('A', 'R'))""")
    }, Some("""
      WITH c AS (SELECT l_quantity AS x, count(*) AS cnt,
                        sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS cnta
                 FROM lineitem WHERE l_returnflag IN ('A', 'R') GROUP BY x),
      r AS (SELECT x, cnt, cnta,
              2 * coalesce(sum(cnt) OVER (ORDER BY x
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + cnt + 1
                AS r2 FROM c),
      sums AS (SELECT
                 CAST(sum(CAST(cnta AS HUGEINT)) AS DOUBLE) AS na,
                 CAST(sum(CAST(cnta AS HUGEINT) * r2) AS DOUBLE) AS two_ra
               FROM r)
      SELECT round((two_ra - na * (na + 1)) / 2.0, 1) AS u_stat
      FROM sums""")),

    // kolmogorovSmirnovTest SPELLING: the D statistic hash-matches the
    // oracle's ECDF max-gap algebra (the relational agg_ks_test proof,
    // R vs N split); the asymptotic p half is spec-pinned.
    QDef("sql_ch_w25_ks", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT round(tupleElement(kolmogorovSmirnovTest(x, i), 1), 4) AS ks_d
        FROM (SELECT toFloat64(l_quantity) AS x,
                     CASE WHEN l_returnflag = 'R' THEN 0 ELSE 1 END AS i
              FROM lineitem WHERE l_returnflag IN ('R', 'N'))""")
    }, Some("""
      WITH vc AS (SELECT l_quantity AS v,
                         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr,
                         sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS cn
                  FROM lineitem WHERE l_returnflag IN ('R', 'N') GROUP BY v),
      tot AS (SELECT CAST(sum(cr) AS DOUBLE) AS nr,
                     CAST(sum(cn) AS DOUBLE) AS nn FROM vc),
      cum AS (SELECT sum(cr) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ar,
                     sum(cn) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS an
              FROM vc)
      SELECT round(max(abs(CAST(ar AS DOUBLE) / nr
                           - CAST(an AS DOUBLE) / nn)), 4) AS ks_d
      FROM cum CROSS JOIN tot""")),

    // CH sparkbar(width)(x, y): the inline ▁▂▃▄▅▆▇█ histogram as a
    // PARAMETRIC aggregate over pre-bucketed (hour, count) pairs —
    // glyph level ⌈8·y/max(y)⌉, exact integer arithmetic; the oracle
    // rebuilds the glyph string from the same levels.
    QDef("sql_ch_sparkbar", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT event_type, sparkbar(24)(hr, c) AS bar
        FROM (SELECT event_type, toHour(ts) AS hr, count() AS c
              FROM events GROUP BY event_type, hr)
        GROUP BY event_type ORDER BY event_type""")
    }, Some("""
      WITH byhr AS (
        SELECT event_type, CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
               count(*) AS c
        FROM events GROUP BY 1, 2),
      mx AS (SELECT event_type, max(c) AS m FROM byhr GROUP BY event_type),
      lv AS (
        SELECT b.event_type, b.hr,
               ['▁','▂','▃','▄','▅','▆','▇','█'][
                 CAST(greatest(1, (b.c * 8 + m.m - 1) // m.m) AS INT)] AS g
        FROM byhr b JOIN mx m USING (event_type))
      SELECT event_type,
             string_agg(g, '' ORDER BY hr) AS bar
      FROM lv GROUP BY event_type ORDER BY event_type""")),

    // toTimeZone faithful semantics (CH: re-labels the DISPLAY zone,
    // instant unchanged): display functions read the target-zone wall
    // clock while the epoch family reads the ORIGINAL instant — both
    // pinned against DuckDB's native ICU timezone math computed
    // INDEPENDENTLY (no constants echoed from the expected output).
    QDef("sql_ch_totimezone", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey AS k,
          toString(toTimeZone(addMinutes(toDateTime('2024-03-05 12:00:00'),
                                         n_nationkey), 'Asia/Tokyo')) AS wall,
          CAST(toHour(toTimeZone(toDateTime('2024-03-05 12:00:00'),
                                 'America/New_York')) AS Int64) AS h,
          toUnixTimestamp(toTimeZone(addMinutes(
            toDateTime('2024-03-05 12:00:00'), n_nationkey),
            'Asia/Tokyo')) AS ep
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
        strftime(timezone('Asia/Tokyo', timezone('UTC',
          TIMESTAMP '2024-03-05 12:00:00' + n_nationkey * INTERVAL 1 MINUTE)),
          '%Y-%m-%d %H:%M:%S') AS wall,
        CAST(hour(timezone('America/New_York', timezone('UTC',
          TIMESTAMP '2024-03-05 12:00:00'))) AS BIGINT) AS h,
        epoch_us(TIMESTAMP '2024-03-05 12:00:00'
                 + n_nationkey * INTERVAL 1 MINUTE) // 1000000 AS ep
      FROM nation ORDER BY k""")),

    // Wave-23 graduation: space-filling curves (mortonEncode restated
    // bit-by-bit in DuckDB; hilbert pinned by the decode∘encode
    // identity + HilbertSpec known answers), 4-gram ngramDistance/
    // ngramSearch (CH's multiset symmetric-difference formula restated
    // with DuckDB list ops), CH percent-encoding, change<Part> family,
    // millisecond arithmetic, UUIDv7/ULID timestamp extraction
    // (crockford base32 restated positionally), snowflakeID roundtrip,
    // toUTCTimestamp/fromUTCTimestamp with the epoch-invariance law,
    // 2-arg timestamp(), makeDateTime64 fraction, arrayDotProduct.
    QDef("sql_ch_w23_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_nationkey AS k,
          mortonEncode(n_nationkey, n_regionkey) AS me,
          tupleElement(mortonDecode(2, mortonEncode(n_nationkey, n_regionkey)), 1)
              = n_nationkey AND
            tupleElement(mortonDecode(2, mortonEncode(n_nationkey, n_regionkey)), 2)
              = n_regionkey AS md_ok,
          tupleElement(hilbertDecode(2, hilbertEncode(n_nationkey, n_regionkey)), 1)
              = n_nationkey AND
            tupleElement(hilbertDecode(2, hilbertEncode(n_nationkey, n_regionkey)), 2)
              = n_regionkey AS hd_ok,
          round(ngramDistance(n_name, 'NATION_5'), 4) AS ngd,
          round(ngramSearch(n_name, 'NATION_5'), 4) AS ngs,
          encodeURLComponent(n_name) AS ue,
          toUnixTimestamp(changeMonth(toDateTime('2024-03-05 12:10:20'),
                                      n_nationkey % 12 + 1)) AS cm,
          toUnixTimestamp64Milli(addMilliseconds(
            toDateTime('2024-01-01 00:00:00'), n_nationkey * 250)) AS am,
          CAST(toMillisecond(addMilliseconds(
            toDateTime('2024-01-01 00:00:00'), n_nationkey * 250)) AS Int64) AS msp,
          toUnixTimestamp64Milli(
            UUIDv7ToDateTime('01890a5d-ac96-774b-b9aa-111111111111')) AS u7,
          toUnixTimestamp64Milli(
            ULIDStringToDateTime('01ARZ3NDEKTSV4RRFFQ69G5FAV')) AS ul,
          toUnixTimestamp(snowflakeIDToDateTime(dateTime64ToSnowflakeID(
            addSeconds(toDateTime('2024-03-05 12:00:00'), n_nationkey)))) AS sf,
          toUnixTimestamp(fromUTCTimestamp(
            toDateTime('2024-03-05 12:00:00'), 'Asia/Tokyo')) AS tu,
          toString(fromUTCTimestamp(
            toDateTime('2024-03-05 12:00:00'), 'Asia/Tokyo')) AS fu,
          arrayDotProduct([n_nationkey, 2], [3, n_regionkey]) AS dp,
          toBool(n_nationkey % 2) AS tb,
          toUnixTimestamp(timestamp('2024-01-01 00:00:00', '10:20:30')) AS ts2,
          toUnixTimestamp64Milli(makeDateTime64(2024, 1, 2, 3, 4, 5, 250)) AS mk
        FROM nation ORDER BY k""")
    }, Some("""
      SELECT n_nationkey AS k,
        CAST(list_sum(list_transform(range(0, 32), i ->
               ((n_nationkey::BIGINT >> i) & 1) << (2*i))) +
             list_sum(list_transform(range(0, 32), i ->
               ((n_regionkey::BIGINT >> i) & 1) << (2*i+1))) AS BIGINT) AS me,
        true AS md_ok,
        true AS hd_ok,
        round((WITH g AS (SELECT
            list_transform(range(1, greatest(length(n_name)-2, 1)),
                           i -> n_name[i:i+3]) AS a,
            list_transform(range(1, 6), i -> 'NATION_5'[i:i+3]) AS b)
          SELECT list_sum(list_transform(list_distinct(list_concat(a, b)), gr ->
                   abs(len(list_filter(a, x -> x = gr)) -
                       len(list_filter(b, x -> x = gr)))))
                 / CAST(len(a) + len(b) AS DOUBLE) FROM g), 4) AS ngd,
        round((WITH g AS (SELECT
            list_transform(range(1, greatest(length(n_name)-2, 1)),
                           i -> n_name[i:i+3]) AS a,
            list_transform(range(1, 6), i -> 'NATION_5'[i:i+3]) AS b)
          SELECT list_sum(list_transform(list_distinct(b), gr ->
                   least(len(list_filter(a, x -> x = gr)),
                         len(list_filter(b, x -> x = gr)))))
                 / CAST(len(b) AS DOUBLE) FROM g), 4) AS ngs,
        replace(n_name, ' ', '%20') AS ue,
        epoch_us(make_timestamp(2024, n_nationkey % 12 + 1, 5, 12, 10, 20))
          // 1000000 AS cm,
        epoch_ms(TIMESTAMP '2024-01-01 00:00:00'
                 + (n_nationkey * 250) * INTERVAL 1 MILLISECOND) AS am,
        CAST((n_nationkey * 250) % 1000 AS BIGINT) AS msp,
        CAST('0x01890a5dac96' AS BIGINT) AS u7,
        CAST(list_sum(list_transform(range(1, 11), i ->
          (strpos('0123456789ABCDEFGHJKMNPQRSTVWXYZ',
                  substr('01ARZ3NDEKTSV4RRFFQ69G5FAV', i, 1)) - 1)
          * CAST(power(32, 10 - i) AS BIGINT))) AS BIGINT) AS ul,
        epoch_us(TIMESTAMP '2024-03-05 12:00:00'
                 + n_nationkey * INTERVAL 1 SECOND) // 1000000 AS sf,
        epoch_us(TIMESTAMP '2024-03-05 12:00:00') // 1000000 AS tu,
        strftime(timezone('Asia/Tokyo', timezone('UTC',
          TIMESTAMP '2024-03-05 12:00:00')), '%Y-%m-%d %H:%M:%S') AS fu,
        3.0 * n_nationkey + 2.0 * n_regionkey AS dp,
        CAST(n_nationkey % 2 AS BOOLEAN) AS tb,
        epoch_us(TIMESTAMP '2024-01-01 10:20:30') // 1000000 AS ts2,
        epoch_ms(TIMESTAMP '2024-01-02 03:04:05.250') AS mk
      FROM nation ORDER BY k""")),

    // Absolute SAMPLE n with n ≫ rowcount (1e12 vs 60k at sf0.01):
    // unclamped, ceil(2^60·n/count) ≈ 1.9e25 overflows BIGINT — Spark
    // saturates, DuckDB errors, engines diverge. The least(…, 2^60)
    // clamp makes the cutoff the full hash span, i.e. every row
    // passes: CH's own behavior for an oversized absolute sample.
    // Oracle = the full table (hash < 2^60 is vacuously true for a
    // 60-bit hash).
    QDef("sql_ch_sample_n_over", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT count() AS c,
               sum(CAST(l_quantity AS Int64)) AS sq
        FROM lineitem SAMPLE 1000000000000""")
    }, Some("""
      SELECT count(*) AS c,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
      FROM lineitem""")),

    // INTERPOLATE (c AS expr): filled rows apply expr to the PREVIOUS
    // row's value, chained — the i-th filled row after an original is
    // expr applied i times (a bounded fold per fill run). The oracle
    // re-derives the chain with run indexes + the affine closed form
    // (c AS c + 10 iterated i times = c + 10·i).
    QDef("sql_ch_interpolate_expr", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey * 4 AS x, CAST(count() AS Int64) AS c
        FROM nation GROUP BY x
        ORDER BY x WITH FILL FROM 0 TO 20 STEP 2
        INTERPOLATE (c AS c + 10)""")
    }, Some("""
      WITH o AS (SELECT n_regionkey * 4 AS x, count(*) AS c
                 FROM nation GROUP BY 1),
      grid AS (SELECT unnest(range(0, 20, 2)) AS x),
      u AS (SELECT g.x AS x, o.c AS c FROM grid g LEFT JOIN o USING (x)),
      w AS (SELECT x, c,
              count(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS grp
            FROM u),
      r AS (SELECT x, c, grp,
              row_number() OVER (PARTITION BY grp ORDER BY x) - 1 AS ri,
              last_value(c IGNORE NULLS)
                OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS pv
            FROM w)
      SELECT CAST(x AS INT) AS x,
             CAST(CASE WHEN c IS NOT NULL THEN c
                       ELSE pv + 10 * ri END AS BIGINT) AS c
      FROM r ORDER BY x""")),

    // Wave-18 graduation: grouping() under ROLLUP, array set algebra
    // (union / symmetric difference), UTF8 position variants, and
    // *Stable aggregate aliases — DuckDB recomputes each (GROUPING(),
    // list_filter algebra, corr). Desc fill and APPLY lambdas stay
    // probe-pinned (their outputs are schema-shaped, not row-stable).
    QDef("sql_ch_w18_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT CAST(g AS Int32) AS g, c, u, sd, p1, p2, corr4 FROM (
          SELECT grouping(n_regionkey) AS g,
                 count() AS c,
                 min(arrayStringConcat(arrayMap(x -> toString(x),
                   arraySort(arrayUnion([n_regionkey, 9], [9, 7]))), '|')) AS u,
                 min(arrayStringConcat(arrayMap(x -> toString(x),
                   arraySort(arraySymmetricDifference([n_regionkey, 7],
                                                      [7, 8]))), '|')) AS sd,
                 CAST(min(positionUTF8('héllo wörld', 'wörld')) AS Int64) AS p1,
                 CAST(min(positionCaseInsensitiveUTF8('HÉLLO', 'éll')) AS Int64) AS p2,
                 round(corrStable(n_nationkey, n_nationkey % 7), 4) AS corr4
          FROM nation GROUP BY ROLLUP(n_regionkey))
        ORDER BY g, c, u""")
    }, Some("""
      SELECT CAST(GROUPING(n_regionkey) AS INT) AS g,
             count(*) AS c,
             CASE WHEN GROUPING(n_regionkey) = 1 THEN
               (SELECT array_to_string(list_sort(list_distinct(
                  [min(n2.n_regionkey), 9, 7])),
                  '|') FROM nation n2)
             ELSE array_to_string(list_sort(list_distinct(
               [n_regionkey, 9, 7])), '|') END AS u,
             CASE WHEN GROUPING(n_regionkey) = 1 THEN
               (SELECT array_to_string(list_sort(
                  list_distinct(list_concat(
                    list_filter([CAST(min(n3.n_regionkey) AS INT), 7],
                                x -> x NOT IN (7, 8)),
                    list_filter([7, 8],
                                x -> x NOT IN (CAST(min(n3.n_regionkey) AS INT), 7))))),
                  '|') FROM nation n3)
             ELSE array_to_string(list_sort(
               list_distinct(list_concat(
                 list_filter([n_regionkey, 7], x -> x NOT IN (7, 8)),
                 list_filter([7, 8], x -> x NOT IN (n_regionkey, 7))))),
               '|') END AS sd,
             CAST(7 AS BIGINT) AS p1,
             CAST(2 AS BIGINT) AS p2,
             round(corr(n_nationkey, n_nationkey % 7), 4) AS corr4
      FROM nation GROUP BY ROLLUP(n_regionkey)
      ORDER BY g, c, u""")),

    // Wave-17 graduation: multi-arg uniqExact (distinct TUPLES),
    // both countIf arities, parametric groupArray(n) (n smallest,
    // the deterministic reinterpretation), weighted quantile through
    // the generic parametric fallback (equal weights ≡ unweighted —
    // pinned against DuckDB's quantile_cont), MySQL-style aliases,
    // match(), and the epoch-anchored toRelative*Num counters.
    QDef("sql_ch_w17_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          uniqExact(n_regionkey % 2, n_nationkey % 3) AS u2,
          countIf(n_nationkey, n_nationkey % 2 = 0) AS ci2,
          countIf(n_nationkey % 2 = 0) AS ci1,
          arrayStringConcat(arrayMap(x -> toString(x),
            groupArray(3)(n_nationkey)), '|') AS ga,
          round(quantileTimingWeighted(0.5)(n_nationkey, 2), 4) AS qtw,
          min(ucase(n_name)) AS uc,
          min(mid(n_name, 2, 3)) AS md,
          match(min(n_name), '^NATION') AS mt,
          min(toRelativeDayNum(toDate('2024-01-02'))) AS rd,
          min(toRelativeHourNum(toDateTime('2024-01-01 05:00:00'))) AS rh
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      WITH g AS (SELECT n_regionkey, list_sort(list(n_nationkey)) AS l,
                        count(DISTINCT CAST(n_regionkey % 2 AS VARCHAR) || ':'
                              || CAST(n_nationkey % 3 AS VARCHAR)) AS u2,
                        count(CASE WHEN n_nationkey % 2 = 0
                                   THEN n_nationkey END) AS ci2,
                        count(*) FILTER (WHERE n_nationkey % 2 = 0) AS ci1,
                        quantile_cont(n_nationkey, 0.5) AS qtw,
                        min(upper(n_name)) AS uc,
                        min(substring(n_name, 2, 3)) AS md,
                        regexp_matches(min(n_name), '^NATION') AS mt
                 FROM nation GROUP BY n_regionkey)
      SELECT n_regionkey AS k, u2, ci2, ci1,
             array_to_string(list_transform(l[1:3],
               x -> CAST(x AS VARCHAR)), '|') AS ga,
             round(qtw, 4) AS qtw, uc, md, mt,
             CAST(date_diff('day', DATE '1970-01-01',
                            DATE '2024-01-02') AS BIGINT) AS rd,
             CAST(date_diff('hour', TIMESTAMP '1970-01-01 00:00:00',
                            TIMESTAMP '2024-01-01 05:00:00') AS BIGINT) AS rh
      FROM g ORDER BY k""")),

    // Wave-19 graduation: string distances (Damerau-Levenshtein OSA,
    // Jaro, Jaro-Winkler — DuckDB ships the same three natively),
    // initcapUTF8, unbin, compact-integer date spellings
    // (YYYYMMDDToDate / …hhmmssToDateTime), makeDate32(y, dayOfYear),
    // parseDateTime (MySQL % codes), arrayPartialSort (deterministic
    // full-sort instance of CH's first-n contract), arrayElementOrNull,
    // splitByNonAlpha, isValidJSON / JSONArrayLength / JSONMergePatch
    // (RFC 7386), mapExists/mapAll over entry lambdas, countMatches,
    // translate, monthName/dateName, toDaysSinceYearZero.
    QDef("sql_ch_w19_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          CAST(min(damerauLevenshteinDistance(n_name, 'NATION_5')) AS Int64) AS dl,
          round(max(jaroSimilarity(n_name, 'NATION_5')), 4) AS js,
          round(max(jaroWinklerSimilarity(n_name, 'NATION_5')), 4) AS jw,
          min(initcapUTF8(lowerUTF8(n_name))) AS ic,
          min(unbin('0100100001001001')) AS ub,
          min(YYYYMMDDToDate(20240110 + n_regionkey)) AS d8,
          min(toUnixTimestamp64Micro(
            YYYYMMDDhhmmssToDateTime(20240110123456))) AS ts8,
          min(makeDate32(2024, n_nationkey + 1)) AS md,
          min(toUnixTimestamp64Micro(
            parseDateTime('2024-03-05 12:34:56', '%Y-%m-%d %H:%i:%s'))) AS pd,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            arrayPartialSort(2, [n_regionkey, 9, 1])), '|')) AS ps,
          min(coalesce(arrayElementOrNull([1, 2], 5), -1)) AS eon,
          min(arrayStringConcat(splitByNonAlpha(n_name), '|')) AS sna,
          min(CAST(isValidJSON(n_name) AS Int32)) AS vj,
          CAST(min(JSONArrayLength('[1, 2, 3]')) AS Int64) AS jl,
          min(JSONMergePatch('{"a": 1, "b": 2}', '{"b": null, "c": 3}')) AS mp,
          max(mapExists((mk, mv) -> mv > n_regionkey, map('x', 3))) AS me,
          max(mapAll((mk, mv) -> mv % 2 = 1, map('x', n_regionkey))) AS ma,
          CAST(min(countMatches(n_name, 'N')) AS Int64) AS cm,
          min(translate(n_name, '_', '-')) AS tr,
          min(monthName(makeDate32(2024, 40))) AS mn,
          min(dateName('weekday', toDate('2024-03-05'))) AS dn,
          CAST(min(toDaysSinceYearZero(toDate('2024-01-01'))) AS Int64) AS dz
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      SELECT n_regionkey AS k,
        CAST(min(damerau_levenshtein(n_name, 'NATION_5')) AS BIGINT) AS dl,
        round(max(jaro_similarity(n_name, 'NATION_5')), 4) AS js,
        round(max(jaro_winkler_similarity(n_name, 'NATION_5')), 4) AS jw,
        min(upper(substring(lower(n_name), 1, 1)) ||
            substring(lower(n_name), 2)) AS ic,
        'HI' AS ub,
        min(CAST(strptime(CAST(20240110 + n_regionkey AS VARCHAR),
                          '%Y%m%d') AS DATE)) AS d8,
        CAST(epoch_us(TIMESTAMP '2024-01-10 12:34:56') AS BIGINT) AS ts8,
        min(DATE '2024-01-01' + n_nationkey) AS md,
        CAST(epoch_us(TIMESTAMP '2024-03-05 12:34:56') AS BIGINT) AS pd,
        min(array_to_string(list_transform(list_sort([n_regionkey, 9, 1]),
          x -> CAST(x AS VARCHAR)), '|')) AS ps,
        CAST(-1 AS INT) AS eon,
        min(array_to_string(list_filter(
          regexp_split_to_array(n_name, '[^A-Za-z0-9]+'), x -> x != ''),
          '|')) AS sna,
        CAST(0 AS INT) AS vj,
        CAST(3 AS BIGINT) AS jl,
        '{"a":1,"c":3}' AS mp,
        max(3 > n_regionkey) AS me,
        max(n_regionkey % 2 = 1) AS ma,
        CAST(min(length(n_name) - length(replace(n_name, 'N', ''))) AS BIGINT) AS cm,
        min(replace(n_name, '_', '-')) AS tr,
        'February' AS mn,
        'Tuesday' AS dn,
        CAST(739251 AS BIGINT) AS dz
      FROM nation GROUP BY n_regionkey ORDER BY k""")),

    // Wave-20 graduation — SYNTAX forms exercised by the query's own
    // structure (scalar WITH constant feeding WHERE, SELECT-alias
    // reused in WHERE à la CH, GROUP BY ALL, ORDER BY ALL, CH's
    // comma LIMIT `LIMIT 1, 8`) plus the function tail: sumCount,
    // arrayEnumerateDense, arrayZip, arrayAUC, bitPositionsToArray,
    // 1-arg mapPopulateSeries, toInt64OrNull, accurateCastOrNull,
    // ifNotFinite over CH divide(), roundBankers/roundToExp2,
    // addDays, dateTimeToSnowflake, splitByString,
    // extractKeyValuePairs, normalizeQuery, tupleConcat,
    // tupleToNameValuePairs.
    QDef("sql_ch_w20_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        WITH 23 AS cut
        SELECT n_regionkey AS k, n_nationkey % 2 AS par, count() AS c,
          CAST(tupleElement(sumCount(n_nationkey), 1) AS Int64) AS sc1,
          CAST(tupleElement(sumCount(n_nationkey), 2) AS Int64) AS sc2,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            arrayEnumerateDense([n_regionkey, 9, n_regionkey])), '|')) AS en,
          min(tupleElement(arrayElement(arrayZip([1, 2], ['a', 'b']), 2), 2)) AS az,
          round(min(arrayAUC([0.1, 0.4, 0.35, 0.8], [0, 0, 1, 1])), 4) AS auc,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            bitPositionsToArray(n_nationkey + 1)), '|')) AS bp,
          min(element_at(mapPopulateSeries(map(1, n_regionkey, 3, 9)), 2)) AS mps,
          min(toInt64OrNull(concat('1', toString(n_regionkey)))) AS i64,
          CAST(min(coalesce(accurateCastOrNull(300 + n_regionkey, 'UInt8'),
                            -1)) AS Int64) AS acn,
          min(ifNotFinite(divide(n_regionkey, 0), -1.0)) AS nf,
          CAST(min(roundBankers(toFloat64(n_regionkey) + 0.5)) AS Int64) AS rb,
          CAST(min(roundToExp2(n_regionkey + 17)) AS Int64) AS r2,
          min(addDays(toDate('2024-01-10'), n_regionkey)) AS rd8,
          min(dateTimeToSnowflake(toDateTime('2021-08-15 10:57:56'))) AS snf,
          min(arrayStringConcat(splitByString('_', n_name), '|')) AS sps,
          min(element_at(extractKeyValuePairs(
            concat('a:', toString(n_regionkey), ', b:2')), 'a')) AS kv,
          min(normalizeQuery('SELECT 1 + 2 AS x FROM t WHERE id = 42')) AS nq,
          CAST(min(tupleElement(tupleConcat((1, 'a'), tuple(n_regionkey)),
                                3)) AS Int64) AS tc,
          CAST(min(tupleElement(arrayElement(
            tupleToNameValuePairs(tuple(n_regionkey)), 1), 2)) AS Int64) AS nv
        FROM nation
        WHERE n_nationkey < cut AND par IN (0, 1)
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 1, 8""")
    }, Some("""
      SELECT n_regionkey AS k, n_nationkey % 2 AS par, count(*) AS c,
        CAST(sum(n_nationkey) AS BIGINT) AS sc1,
        CAST(count(n_nationkey) AS BIGINT) AS sc2,
        '1|2|1' AS en, 'b' AS az, CAST(0.75 AS DOUBLE) AS auc,
        min(array_to_string(list_transform(
          list_filter(range(0, 64),
                      i -> (((n_nationkey + 1) >> i) & 1) = 1),
          x -> CAST(x AS VARCHAR)), '|')) AS bp,
        CAST(0 AS BIGINT) AS mps,
        min(CAST('1' || CAST(n_regionkey AS VARCHAR) AS BIGINT)) AS i64,
        CAST(-1 AS BIGINT) AS acn,
        CAST(-1.0 AS DOUBLE) AS nf,
        CAST(min(CASE WHEN n_regionkey % 2 = 0 THEN n_regionkey
                      ELSE n_regionkey + 1 END) AS BIGINT) AS rb,
        CAST(16 AS BIGINT) AS r2,
        min(DATE '2024-01-10' + CAST(n_regionkey AS INT)) AS rd8,
        CAST(1426860702823350272 AS BIGINT) AS snf,
        min(replace(n_name, '_', '|')) AS sps,
        min(CAST(n_regionkey AS VARCHAR)) AS kv,
        'SELECT ? + ? AS x FROM t WHERE id = ?' AS nq,
        CAST(min(n_regionkey) AS BIGINT) AS tc,
        CAST(min(n_regionkey) AS BIGINT) AS nv
      FROM nation
      WHERE n_nationkey < 23 AND (n_nationkey % 2) IN (0, 1)
      GROUP BY ALL
      ORDER BY ALL
      LIMIT 8 OFFSET 1""")),

    // Wave-21 graduation: vector norms/normalization (L1/L2/Linf/Lp),
    // tuple arithmetic + tuple dotProduct, bitCount/rotate,
    // little-endian reinterpret roundtrip, ISO year/week + MySQL-mode
    // toWeek/toYearWeek (known answers), SAMPLE skew/kurt from raw
    // power sums (same formula restated in DuckDB), timestamp-keyed
    // deltaSum, URL-safe base64, toFixedString/CutToZero roundtrip.
    QDef("sql_ch_w21_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          round(min(L2Norm([n_nationkey, 3])), 4) AS l2n,
          CAST(min(L1Norm([n_nationkey, -2])) AS Int64) AS l1n,
          CAST(min(LinfNorm([n_nationkey, -2])) AS Int64) AS lin,
          round(min(LpNorm([n_nationkey, 2], 3)), 4) AS lpn,
          round(min(arrayElement(L2Normalize([n_nationkey, 4]), 2)), 4) AS nrm,
          CAST(min(tupleElement(tuplePlus((n_regionkey, 2), (3, 4)), 1))
            AS Int64) AS tp,
          CAST(min(dotProduct((n_regionkey, 2), (3, 4))) AS Int64) AS tdp,
          round(min(dotProduct([toFloat64(n_nationkey), 2.0], [3.0, 4.0])), 4) AS adp,
          CAST(min(bitCount(n_nationkey)) AS Int64) AS bc,
          CAST(min(bitRotateLeft(CAST(n_nationkey AS UInt8), 1)) AS Int64) AS brl,
          min(reinterpretAsUInt64(reinterpretAsString(12345 + n_nationkey))) AS ri,
          CAST(min(toISOYear(addDays(toDate('2024-01-01'), n_nationkey)))
            AS Int64) AS iy,
          CAST(min(toISOWeek(addDays(toDate('2024-01-01'), n_nationkey)))
            AS Int64) AS iw,
          CAST(min(toWeek(toDate('2024-03-05'))) AS Int64) AS w0,
          CAST(min(toWeek(toDate('2024-03-05'), 1)) AS Int64) AS w1,
          CAST(min(toWeek(toDate('2017-01-01'), 1)) AS Int64) AS w1z,
          CAST(min(toYearWeek(toDate('2024-03-05'))) AS Int64) AS yw,
          CAST(min(toYearWeek(toDate('2016-01-01'))) AS Int64) AS ywz,
          round(skewSamp(n_nationkey), 4) AS sks,
          round(kurtSamp(n_nationkey), 4) AS kts,
          CAST(deltaSumTimestamp(CAST(n_nationkey * n_nationkey % 7 AS Int64),
                                 n_nationkey) AS Int64) AS dst,
          min(base64URLEncode('q?' || n_name)) AS b64,
          min(toStringCutToZero(toFixedString(n_name, 12))) AS fsr
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      WITH m AS (
        SELECT n_regionkey,
               count(*) AS n,
               avg(CAST(n_nationkey AS DOUBLE)) AS m1,
               avg(CAST(n_nationkey AS DOUBLE) * n_nationkey) AS m2,
               avg(CAST(n_nationkey AS DOUBLE) * n_nationkey * n_nationkey) AS m3,
               avg(CAST(n_nationkey AS DOUBLE) * n_nationkey * n_nationkey
                   * n_nationkey) AS m4
        FROM nation GROUP BY n_regionkey),
      dv AS (
        SELECT n_regionkey, n_nationkey AS t,
               CAST(n_nationkey * n_nationkey % 7 AS BIGINT) AS v,
               lag(CAST(n_nationkey * n_nationkey % 7 AS BIGINT))
                 OVER (PARTITION BY n_regionkey ORDER BY n_nationkey) AS pv
        FROM nation),
      ds AS (
        SELECT n_regionkey,
               CAST(sum(CASE WHEN pv IS NOT NULL AND v > pv THEN v - pv
                             ELSE 0 END) AS BIGINT) AS dst
        FROM dv GROUP BY n_regionkey)
      SELECT n.n_regionkey AS k,
        round(min(sqrt(CAST(n_nationkey * n_nationkey + 9 AS DOUBLE))), 4) AS l2n,
        CAST(min(n_nationkey + 2) AS BIGINT) AS l1n,
        CAST(min(greatest(n_nationkey, 2)) AS BIGINT) AS lin,
        round(min(pow(CAST(n_nationkey AS DOUBLE) * n_nationkey * n_nationkey
                      + 8, 1.0 / 3)), 4) AS lpn,
        round(min(4.0 / sqrt(CAST(n_nationkey * n_nationkey + 16 AS DOUBLE))),
              4) AS nrm,
        CAST(min(n.n_regionkey + 3) AS BIGINT) AS tp,
        CAST(min(n.n_regionkey * 3 + 8) AS BIGINT) AS tdp,
        round(min(CAST(n_nationkey * 3 + 8 AS DOUBLE)), 4) AS adp,
        CAST(min(bit_count(n_nationkey)) AS BIGINT) AS bc,
        CAST(min(n_nationkey * 2) AS BIGINT) AS brl,
        min(12345 + n_nationkey) AS ri,
        CAST(min(isoyear(DATE '2024-01-01' + CAST(n_nationkey AS INT)))
          AS BIGINT) AS iy,
        CAST(min(weekofyear(DATE '2024-01-01' + CAST(n_nationkey AS INT)))
          AS BIGINT) AS iw,
        CAST(9 AS BIGINT) AS w0,
        CAST(10 AS BIGINT) AS w1,
        CAST(0 AS BIGINT) AS w1z,
        CAST(202409 AS BIGINT) AS yw,
        CAST(201552 AS BIGINT) AS ywz,
        round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) /
              pow(n * (m2 - m1 * m1) / (n - 1), 1.5), 4) AS sks,
        round((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) /
              pow(n * (m2 - m1 * m1) / (n - 1), 2), 4) AS kts,
        min(ds.dst) AS dst,
        min(regexp_replace(translate(to_base64(
              CAST(('q?' || n_name) AS BLOB)), '+/', '-_'), '=+$', '')) AS b64,
        min(n_name) AS fsr
      FROM nation n
      JOIN m ON m.n_regionkey = n.n_regionkey
      JOIN ds ON ds.n_regionkey = n.n_regionkey
      GROUP BY n.n_regionkey, m.n, m.m1, m.m2, m.m3, m.m4
      ORDER BY k""")),

    // Wave-22 graduation: lambda array utilities (arrayFirst/Last/
    // Index, arrayFill LOCF, arrayReduce), 3-arg position, transform
    // without default, null-handling spellings, positiveModulo /
    // intDivOrZero, bar (length-checked), throwIf false path,
    // simpleJSON aliases, replaceRegexp family, UTF8 slices,
    // multiSearchAny, toTypeName/currentDatabase constants.
    QDef("sql_ch_w22_batch", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT n_regionkey AS k,
          CAST(min(arrayFirst(x -> x > n_regionkey, [1, 3, 5])) AS Int64) AS af,
          CAST(min(arrayLastIndex(x -> x > n_regionkey, [1, 3, 5])) AS Int64) AS ali,
          min(arrayStringConcat(arrayMap(x -> toString(x),
            arrayFill(x -> x != 0, [n_regionkey, 0, 7, 0])), '|')) AS afl,
          CAST(min(positiveModulo(n_regionkey - 9, 7)) AS Int64) AS pm,
          CAST(min(intDivOrZero(n_regionkey, n_regionkey % 3)) AS Int64) AS idz,
          CAST(min(max2(n_regionkey, 2)) AS Int64) AS mx2,
          CAST(min(lengthUTF8(bar(n_regionkey, 0, 4, 4))) AS Int64) AS barlen,
          CAST(min(throwIf(n_regionkey > 99, 'unreachable')) AS Int64) AS ti,
          CAST(min(position('hello hello', 'hello', n_regionkey + 1)) AS Int64) AS p3,
          max(multiSearchAny(n_name, ['ATION', 'zzz'])) AS msa,
          CAST(min(ifNull(nullIf(n_regionkey, 2), -1)) AS Int64) AS nf,
          min(simpleJSONExtractString('{"a": "' || n_name || '"}', 'a')) AS sj,
          CAST(min(transform(n_regionkey, [0, 1], [100, 200])) AS Int64) AS tr3,
          min(replaceRegexpAll(n_name, '[0-9]', '#')) AS rra,
          min(substringUTF8(n_name, 2, 4)) AS su,
          CAST(min(arrayReduce('sum', [n_regionkey, 2])) AS Int64) AS ar,
          min(toTypeName(n_regionkey)) AS tn,
          min(currentDatabase()) AS db
        FROM nation GROUP BY n_regionkey ORDER BY k""")
    }, Some("""
      SELECT n_regionkey AS k,
        CAST(min((list_filter([1, 3, 5], x -> x > n_regionkey))[1]) AS BIGINT) AS af,
        CAST(3 AS BIGINT) AS ali,
        min(CASE WHEN n_regionkey = 0 THEN '0|0|7|7'
                 ELSE CAST(n_regionkey AS VARCHAR) || '|' ||
                      CAST(n_regionkey AS VARCHAR) || '|7|7' END) AS afl,
        CAST(min(((n_regionkey - 9) % 7 + 7) % 7) AS BIGINT) AS pm,
        CAST(min(CASE WHEN n_regionkey % 3 = 0 THEN 0
                      ELSE n_regionkey // (n_regionkey % 3) END) AS BIGINT) AS idz,
        CAST(min(greatest(n_regionkey, 2)) AS BIGINT) AS mx2,
        CAST(min(n_regionkey) AS BIGINT) AS barlen,
        CAST(0 AS BIGINT) AS ti,
        CAST(min(CASE WHEN n_regionkey = 0 THEN 1 ELSE 7 END) AS BIGINT) AS p3,
        max(contains(n_name, 'ATION')) AS msa,
        CAST(min(CASE WHEN n_regionkey = 2 THEN -1 ELSE n_regionkey END)
          AS BIGINT) AS nf,
        min(n_name) AS sj,
        CAST(min(CASE WHEN n_regionkey = 0 THEN 100
                      WHEN n_regionkey = 1 THEN 200
                      ELSE n_regionkey END) AS BIGINT) AS tr3,
        min(regexp_replace(n_name, '[0-9]', '#', 'g')) AS rra,
        min(substring(n_name, 2, 4)) AS su,
        CAST(min(n_regionkey + 2) AS BIGINT) AS ar,
        'int' AS tn, 'default' AS db
      FROM nation GROUP BY n_regionkey ORDER BY k"""))
  )
}
