package graft.queries

import graft.{Det, QDef, Tables}
import graft.ops.{Relational, SkipIndex, Text}
import graft.plans.{LimitByPlan, Projections}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.1 MergeTree-family query-time semantics +
  * §2.6 DISTINCT ON / WITH FILL / LIMIT BY + §2.1 I/O formats.
  * MergeTree "merge-time" behaviors (replace/collapse/sum) are
  * query-time rewrites here — Spark's immutable parquet needs no
  * background merges for correctness (SURVEY §3.3).
  */
object MergeTreeQueries {

  val defs: Seq[QDef] = Seq(

    // ReplacingMergeTree: latest state per (user, event_type), version
    // = event time (unique per user in the fixture).
    QDef("mt_replacing", (s, dir) => {
      import s.implicits._
      Relational.replacingLatest(
        Tables(s, dir, "events"), Seq("user_id", "event_type"),
        Seq($"ts", $"event_id"))
        .select($"user_id", $"event_type", $"event_id".as("last_event"),
          round($"value", 4).as("last_value"))
        .orderBy($"user_id", $"event_type")
    }, Some("""
      SELECT user_id, event_type, event_id AS last_event,
             round(value, 4) AS last_value
      FROM (SELECT user_id, event_type, event_id, value,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type""")),

    // CollapsingMergeTree: ±1 sign rows net out per key; cancelled
    // groups vanish. Sign synthesized deterministically from event_id.
    QDef("mt_collapsing", (s, dir) => {
      import s.implicits._
      val signed = Tables(s, dir, "events")
        .withColumn("sign", when($"event_id" % 3 === 0, -1).otherwise(1))
      Relational.collapse(signed, Seq("user_id"), $"sign")
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, net_sign, n_rows FROM (
        SELECT user_id,
               CAST(sum(CASE WHEN event_id % 3 = 0 THEN -1 ELSE 1 END) AS BIGINT) AS net_sign,
               count(*) AS n_rows
        FROM events GROUP BY user_id)
      WHERE net_sign <> 0 ORDER BY user_id""")),

    // SummingMergeTree: pre-aggregated rows per sort key ≡ plain
    // GROUP BY sum at query time.
    QDef("mt_summing", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(Det.dsum($"value").as("value_sum"), count(lit(1)).as("n"))
        .orderBy($"user_id", $"event_type")
    }, Some(s"""
      SELECT user_id, event_type, ${Det.sqlSum("value")} AS value_sum,
             count(*) AS n
      FROM events GROUP BY user_id, event_type
      ORDER BY user_id, event_type""")),

    // DISTINCT ON (nation): the top-balance customer row per nation —
    // deterministic ordered pick, unlike bare dropDuplicates.
    QDef("rel_distinct_on", (s, dir) => {
      import s.implicits._
      Relational.distinctOn(Tables(s, dir, "customer"),
        Seq("c_nationkey"), Seq($"c_acctbal".desc, $"c_custkey".asc))
        .select($"c_nationkey", $"c_custkey", $"c_mktsegment")
        .orderBy($"c_nationkey")
    }, Some("""
      SELECT c_nationkey, c_custkey, c_mktsegment
      FROM (SELECT c_nationkey, c_custkey, c_mktsegment,
                   row_number() OVER (PARTITION BY c_nationkey
                                      ORDER BY c_acctbal DESC, c_custkey) AS rn
            FROM customer)
      WHERE rn = 1 ORDER BY c_nationkey""")),

    // LIMIT 2 BY brand: general per-group limit (n>1 — the r1 gap).
    QDef("rel_limit_by", (s, dir) => {
      import s.implicits._
      Relational.limitBy(Tables(s, dir, "part"), Seq("p_brand"), 2,
        Seq($"p_retailprice".desc, $"p_partkey".asc))
        .select($"p_brand", $"p_partkey", $"p_retailprice")
        .orderBy($"p_brand", $"p_retailprice".desc, $"p_partkey")
    }, Some("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
      WHERE rn <= 2 ORDER BY p_brand, p_retailprice DESC, p_partkey""")),

    // LIMIT 2 BY brand through the CUSTOM PHYSICAL OPERATOR
    // (plans/LimitByPlan.scala — LogicalPlan + Strategy + two
    // SparkPlans): map-side bounded-heap pruning BEFORE the exchange,
    // so the shuffle carries O(keys·n) rows per partition instead of
    // O(rows). Same answer as rel_limit_by's window form (and the
    // same oracle), different — and at scale far cheaper — plan.
    QDef("rel_limit_by_exec", (s, dir) => {
      import s.implicits._
      LimitByPlan.limitBy(Tables(s, dir, "part"), Seq("p_brand"), 2,
        Seq(("p_retailprice", false), ("p_partkey", true)))
        .select($"p_brand", $"p_partkey", $"p_retailprice")
        .orderBy($"p_brand", $"p_retailprice".desc, $"p_partkey")
    }, Some("""
      SELECT p_brand, p_partkey, p_retailprice
      FROM (SELECT p_brand, p_partkey, p_retailprice,
                   row_number() OVER (PARTITION BY p_brand
                                      ORDER BY p_retailprice DESC, p_partkey) AS rn
            FROM part)
      WHERE rn <= 2 ORDER BY p_brand, p_retailprice DESC, p_partkey""")),

    // ORDER BY day WITH FILL: calendar gap-fill of daily event counts
    // (generate series + broadcast left join; zero-filled).
    QDef("rel_with_fill", (s, dir) => {
      import s.implicits._
      val daily = Tables(s, dir, "events")
        .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      Relational.withFillDays(daily, "day", Map("n" -> lit(0L)))
        .orderBy($"day")
    }, Some("""
      SELECT day, coalesce(n, 0) AS n
      FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
            FROM (SELECT min(day) AS lo, max(day) AS hi
                  FROM (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
                        FROM events)))
      LEFT JOIN (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                        count(*) AS n
                 FROM events GROUP BY 1) USING (day)
      ORDER BY day""")),

    // WITH FILL over a NUMERIC axis (FROM 1 TO 51 STEP 1): quantity
    // histogram of a sparse lineitem subset — missing quantities
    // appear as zero-count rows. The CH numeric-fill form next to the
    // calendar fill above; the generated series broadcasts.
    QDef("rel_fill_step", (s, dir) => {
      import s.implicits._
      val sparse = Tables(s, dir, "lineitem")
        .filter($"l_orderkey" % 97 === 0)
        .groupBy($"l_quantity").agg(count(lit(1)).as("n"))
      Relational.withFillStep(sparse, "l_quantity", 1L, 51L, 1L,
        Map("n" -> lit(0L)))
        .orderBy($"l_quantity")
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

    // WITH FILL + LOCF (last observation carried forward): gap days
    // take the most recent real daily sum — the other common fill mode
    // next to rel_fill_interpolate's linear one. Spark: last_value
    // with ignoreNulls over the calendar-joined series; DuckDB: native
    // IGNORE NULLS. The window runs over the AGGREGATED daily series
    // (bounded by the calendar span), not raw rows.
    QDef("rel_fill_locf", (s, dir) => {
      import s.implicits._
      val daily = Tables(s, dir, "events")
        .filter($"event_type" === "purchase")
        .groupBy(date_trunc("day", $"ts").cast("date").as("day"))
        .agg(Det.dsum($"value").as("v"))
      val mm = daily.agg(min($"day").as("lo"), max($"day").as("hi"))
      val cal = mm.select(explode(sequence($"lo", $"hi", expr("INTERVAL 1 DAY"))).as("day"))
      val w = org.apache.spark.sql.expressions.Window.orderBy($"day")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      broadcast(cal).join(daily, Seq("day"), "left")
        .withColumn("v_locf", last($"v", ignoreNulls = true).over(w))
        .select($"day", $"v_locf")
        .orderBy($"day")
    }, Some("""
      SELECT day,
             last_value(v IGNORE NULLS) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf
      FROM (SELECT day, v
            FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS day
                  FROM (SELECT min(day) AS lo, max(day) AS hi
                        FROM (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day
                              FROM events WHERE event_type = 'purchase')))
            LEFT JOIN (SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
                              round(CAST(sum(CAST(value AS DECIMAL(22,6))) AS DOUBLE), 4) AS v
                       FROM events WHERE event_type = 'purchase' GROUP BY 1) USING (day))
      ORDER BY day""")),

    // VersionedCollapsingMergeTree (FINAL): a versioned ±sign stream
    // synthesized deterministically from orders — v1 insert for every
    // key; even keys get a v1 cancel + v2 insert at an updated price
    // (the mirror contract: a cancel row repeats the payload it
    // cancels); keys % 6 == 0 additionally cancel v2 → fully deleted.
    // Live state = highest version with positive net sign per key
    // (ops/Relational.versionedCollapse). The oracle restates the
    // whole pipeline relationally.
    QDef("mt_versioned_collapsing", (s, dir) => {
      import s.implicits._
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("p"))
      def mk(f: org.apache.spark.sql.DataFrame, price: org.apache.spark.sql.Column,
          ver: Int, sign: Int) =
        f.select($"k", $"st", price.as("price"), lit(ver).as("version"),
          lit(sign).as("sign"))
      val even = base.filter($"k" % 2 === 0)
      // +10% in INTEGER CENTS: round(p·1.1, 2) straddles double-
      // rounding edges differently per engine; integer cent arithmetic
      // followed by one exact division is bit-identical everywhere
      val bumped = expr(
        "CAST(CAST(round(p * 100, 0) AS BIGINT) * 11 DIV 10 AS DOUBLE) / 100.0")
      val stream = mk(base, $"p", 1, 1)
        .union(mk(even, $"p", 1, -1))
        .union(mk(even, bumped, 2, 1))
        .union(mk(base.filter($"k" % 6 === 0), bumped, 2, -1))
      Relational.versionedCollapse(stream, Seq("k"), "version", "sign")
        .groupBy($"st")
        .agg(count(lit(1)).as("live_rows"),
          Det.dsum($"price").as("live_value"),
          sum(when($"version" === 2, 1L).otherwise(0L)).as("v2_rows"))
        .select($"st".as("o_orderstatus"), $"live_rows", $"live_value", $"v2_rows")
        .orderBy($"o_orderstatus")
    }, Some(s"""
      WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                           o_totalprice AS p FROM orders),
      stream AS (
        SELECT k, st, p AS price, 1 AS version, 1 AS sign FROM base
        UNION ALL SELECT k, st, p, 1, -1 FROM base WHERE k % 2 = 0
        UNION ALL SELECT k, st, (CAST(round(p * 100, 0) AS BIGINT) * 11 // 10) / 100.0,
                   2, 1 FROM base WHERE k % 2 = 0
        UNION ALL SELECT k, st, (CAST(round(p * 100, 0) AS BIGINT) * 11 // 10) / 100.0,
                   2, -1 FROM base WHERE k % 6 = 0),
      net AS (SELECT k, version, max(st) AS st, max(price) AS price,
                     sum(sign) AS net
              FROM stream GROUP BY k, version),
      live AS (SELECT k, st, price, version,
                      row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
               FROM net WHERE net > 0)
      SELECT st AS o_orderstatus, count(*) AS live_rows,
             ${Det.sqlSum("price")} AS live_value,
             CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2_rows
      FROM live WHERE rn = 1 GROUP BY st ORDER BY o_orderstatus""")),

    // VersionedCollapsing FINAL proper: when a key has SEVERAL
    // uncancelled versions, upstream FINAL keeps them all (the query
    // above is the latest-state view). Stream: v1 insert everywhere,
    // v2 insert for even keys (v1 NOT cancelled — two live versions),
    // v2 cancelled again for k % 6 == 0. versionedCollapseFinal must
    // return both live versions of even keys.
    QDef("mt_versioned_final", (s, dir) => {
      import s.implicits._
      val base = Tables(s, dir, "orders")
        .select($"o_orderkey".as("k"), $"o_orderstatus".as("st"),
          $"o_totalprice".as("p"))
      def mk(f: org.apache.spark.sql.DataFrame, price: org.apache.spark.sql.Column,
          ver: Int, sign: Int) =
        f.select($"k", $"st", price.as("price"), lit(ver).as("version"),
          lit(sign).as("sign"))
      val even = base.filter($"k" % 2 === 0)
      val bumped = expr(
        "CAST(CAST(round(p * 100, 0) AS BIGINT) * 11 DIV 10 AS DOUBLE) / 100.0")
      val stream = mk(base, $"p", 1, 1)
        .union(mk(even, bumped, 2, 1))
        .union(mk(base.filter($"k" % 6 === 0), bumped, 2, -1))
      Relational.versionedCollapseFinal(stream, Seq("k"), "version", "sign")
        .groupBy($"st")
        .agg(count(lit(1)).as("live_rows"),
          Det.dsum($"price").as("live_value"),
          sum(when($"version" === 2, 1L).otherwise(0L)).as("v2_rows"))
        .select($"st".as("o_orderstatus"), $"live_rows", $"live_value", $"v2_rows")
        .orderBy($"o_orderstatus")
    }, Some(s"""
      WITH base AS (SELECT o_orderkey AS k, o_orderstatus AS st,
                           o_totalprice AS p FROM orders),
      stream AS (
        SELECT k, st, p AS price, 1 AS version, 1 AS sign FROM base
        UNION ALL SELECT k, st, (CAST(round(p * 100, 0) AS BIGINT) * 11 // 10) / 100.0,
                   2, 1 FROM base WHERE k % 2 = 0
        UNION ALL SELECT k, st, (CAST(round(p * 100, 0) AS BIGINT) * 11 // 10) / 100.0,
                   2, -1 FROM base WHERE k % 6 = 0),
      net AS (SELECT k, version, max(st) AS st, max(price) AS price,
                     sum(sign) AS net
              FROM stream GROUP BY k, version)
      SELECT st AS o_orderstatus, count(*) AS live_rows,
             ${Det.sqlSum("price")} AS live_value,
             CAST(sum(CASE WHEN version = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2_rows
      FROM net WHERE net > 0 GROUP BY st ORDER BY o_orderstatus""")),

    // MergeTree TTL at query time: ROW TTL keeps the last 365 days
    // relative to the table's own max(o_orderdate) (deterministic
    // "now" — what a merge would have applied when the newest part
    // landed); COLUMN TTL nulls o_custkey past a tighter 180-day
    // horizon while the row survives. Both helpers broadcast the 1-row
    // max, so the row filter remains a scan predicate at any scale.
    QDef("mt_ttl", (s, dir) => {
      import s.implicits._
      val o = Tables(s, dir, "orders")
      val kept = Relational.applyRowTtl(o, "o_orderdate", "365 DAY")
      val masked = Relational.applyColumnTtl(kept, "o_orderdate", "180 DAY",
        Seq("o_custkey"))
      masked.groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("kept_rows"),
          count($"o_custkey").as("cust_live"),
          Det.dsum($"o_totalprice").as("kept_value"))
        .orderBy($"o_orderpriority")
    }, Some(s"""
      WITH mx AS (SELECT max(o_orderdate) AS now FROM orders),
      kept AS (SELECT o_orderpriority, o_totalprice,
                      CASE WHEN o_orderdate > (SELECT now FROM mx) - INTERVAL 180 DAY
                           THEN o_custkey END AS o_custkey
               FROM orders
               WHERE o_orderdate > (SELECT now FROM mx) - INTERVAL 365 DAY)
      SELECT o_orderpriority, count(*) AS kept_rows,
             count(o_custkey) AS cust_live,
             ${Det.sqlSum("o_totalprice")} AS kept_value
      FROM kept GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // SAMPLE the ClickHouse way: not pseudo-random but a DETERMINISTIC
    // hash threshold on the sampling key (CH's `SAMPLE 0.1` keeps rows
    // with intHash64(key) in the bottom tenth of the hash space) —
    // repeatable across runs, engines, and cluster sizes, which is why
    // it's oracle-checkable where rand()-based sampling is not. The
    // md5-derived mh60 is the repo's cross-engine hash primitive.
    QDef("rel_sample_hash", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "lineitem")
        .filter(Text.mh60(lit("smp"), $"l_orderkey") % 100 < 10)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_sampled"),
          Det.dsum($"l_quantity").as("qty_sum"))
        .orderBy($"l_returnflag")
    }, Some(s"""
      SELECT l_returnflag, count(*) AS n_sampled,
             ${Det.sqlSum("l_quantity")} AS qty_sum
      FROM lineitem
      WHERE CAST('0x' || substring(md5('smp|' || l_orderkey), 1, 15) AS BIGINT)
              % 100 < 10
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // I/O formats (§2.1): csv / json / orc round-trips of the nation
    // table — write, read back, prove contents identical per format.
    QDef("mt_formats", (s, dir) => {
      import s.implicits._
      val nation = Tables(s, dir, "nation")
      val tmp = s"${System.getProperty("java.io.tmpdir")}/graft_formats"
      val out = Seq("csv", "json", "orc").map { fmt =>
        val path = s"$tmp/$fmt"
        val w = nation.write.mode("overwrite")
        (fmt match {
          case "csv" => w.option("header", "true")
          case _ => w
        }).format(fmt).save(path)
        val r = s.read
        val back = (fmt match {
          case "csv" => r.option("header", "true").schema(nation.schema)
          case _ => r.schema(nation.schema)
        }).format(fmt).load(path)
        back.agg(count(lit(1)).as("n"), sum($"n_nationkey").as("key_sum"))
          .select(lit(fmt).as("fmt"), $"n", $"key_sum")
      }
      out.reduce(_ unionByName _).orderBy($"fmt")
    }, Some("""
      SELECT fmt, count(*) AS n, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
      FROM nation, (SELECT unnest(['csv', 'json', 'orc']) AS fmt)
      GROUP BY fmt ORDER BY fmt""")),

    // MergeTree PROJECTION: materialize a pre-aggregate, install the
    // ProjectionRewrite optimizer rule, then query the BASE table —
    // Catalyst transparently answers from the projection (sum of
    // partial sums, sum of partial counts, min/max of partials; exact
    // because the money sum is decimal). The oracle aggregates the
    // base table directly, so a hash match proves the rewritten plan
    // is result-identical. ProjectionSpec asserts the plan actually
    // scans the projection parquet.
    QDef("mt_projection", (s, dir) => {
      import s.implicits._
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      Projections.materialize(s, s"orders_by_status_$tag",
        s"$dir/orders.parquet",
        s"${System.getProperty("java.io.tmpdir")}/graft_proj/$tag/orders_by_status",
        Seq("o_orderstatus", "o_orderpriority"),
        Seq(Projections.Measure("sum", "CAST(o_totalprice AS DECIMAL(22,6))", "sum_price"),
          Projections.Measure("count", "1", "cnt"),
          Projections.Measure("min", "o_totalprice", "min_price"),
          Projections.Measure("max", "o_totalprice", "max_price")))
      Projections.install(s)
      Tables(s, dir, "orders")
        .groupBy($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice".cast("decimal(22,6)")).cast("double"), 4).as("rev"),
          round(min($"o_totalprice"), 4).as("lo"),
          round(max($"o_totalprice"), 4).as("hi"))
        .orderBy($"o_orderstatus", $"o_orderpriority")
    }, Some(s"""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n,
             ${Det.sqlSum("o_totalprice")} AS rev,
             round(min(o_totalprice), 4) AS lo,
             round(max(o_totalprice), 4) AS hi
      FROM orders GROUP BY o_orderstatus, o_orderpriority
      ORDER BY o_orderstatus, o_orderpriority""")),

    // Projection DERIVED aggregates: avg is not stored — the rule
    // derives it as sum(sum_x)/sum(cnt) from the stored partials — and
    // count(DISTINCT dim) survives because the projection keeps one
    // row per dims combination. Grouping by a SUBSET of the dims
    // (o_orderstatus only) exercises partial-merge over the other dim.
    // Oracle computed from the base table; ProjectionSpec asserts the
    // plan scans the projection parquet.
    QDef("mt_projection_derived", (s, dir) => {
      import s.implicits._
      val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
      Projections.materialize(s, s"orders_derived_$tag",
        s"$dir/orders.parquet",
        s"${System.getProperty("java.io.tmpdir")}/graft_proj/$tag/orders_derived",
        Seq("o_orderstatus", "o_orderpriority"),
        Seq(Projections.Measure("sum", "o_totalprice", "sum_price_d"),
          Projections.Measure("count", "1", "cnt")))
      Projections.install(s)
      Tables(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(round(avg($"o_totalprice"), 4).as("avg_price"),
          countDistinct($"o_orderpriority").as("n_prio"),
          count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, round(avg(o_totalprice), 4) AS avg_price,
             count(DISTINCT o_orderpriority) AS n_prio, count(*) AS n
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // MergeTree data-skipping (secondary) index: minmax + set(N) at
    // FILE granularity (ops/SkipIndex — range-clustered layout, side
    // manifest, lossless prune-then-scan; SkipIndexSpec proves ≥half
    // the files skip on point lookups and that overflow degrades to
    // minmax-only). The query answers three point lookups on the
    // NON-sort-key l_partkey reading only manifest-surviving files;
    // the oracle is the plain filter — identical results prove the
    // pruning lossless end-to-end at the gate scale too.
    QDef("mt_skip_index", (s, dir) => {
      import s.implicits._
      val dest = s"${System.getProperty("java.io.tmpdir")}/graft_skipidx_" +
        math.abs(dir.hashCode).toString
      if (!new java.io.File(s"$dest/_skipidx").exists())
        SkipIndex.build(Tables(s, dir, "lineitem"), dest, "l_partkey", 16)
      Seq(1L, 50L, 99L).map { k =>
        SkipIndex.scanEq(s, dest, "l_partkey", k)
          .groupBy($"l_partkey")
          .agg(count(lit(1)).as("n"), Det.dsum($"l_quantity").as("qty"))
      }.reduce(_ unionByName _).orderBy($"l_partkey")
    }, Some(s"""
      SELECT l_partkey, count(*) AS n, ${Det.sqlSum("l_quantity")} AS qty
      FROM lineitem WHERE l_partkey IN (1, 50, 99)
      GROUP BY l_partkey ORDER BY l_partkey""")),

    // bloom_filter skip index (CH's third skip-index kind) on the
    // high-cardinality c_name: per-file 32k-bit blooms (sparse
    // word→bits manifest, md5-position parity between build and
    // probe), point lookups read only bloom-surviving files. The
    // plain-filter oracle proves the pruning lossless; SkipIndexSpec
    // pins the pruning RATE and the absent-value short-circuit.
    QDef("mt_bloom_index", (s, dir) => {
      import s.implicits._
      val dest = s"${System.getProperty("java.io.tmpdir")}/graft_bloomidx_" +
        math.abs(dir.hashCode).toString
      if (!new java.io.File(s"$dest/_bloomidx").exists())
        SkipIndex.buildBloom(Tables(s, dir, "customer"), dest, "c_name", 8)
      Seq("Customer#000000003", "Customer#000000077", "Customer#000000119")
        .map { n =>
          SkipIndex.scanEqBloom(s, dest, "c_name", n)
            .select($"c_name", $"c_custkey", $"c_nationkey")
        }.reduce(_ unionByName _).orderBy($"c_name")
    }, Some("""
      SELECT c_name, c_custkey, c_nationkey
      FROM customer
      WHERE c_name IN ('Customer#000000003', 'Customer#000000077',
                       'Customer#000000119')
      ORDER BY c_name""")),

    // CH `PARTITION BY toYYYYMM(date)` → the Hive-partitioned parquet
    // layout (r19 verdict task 8): the partition key becomes the
    // directory column, and a partition-key predicate prunes whole
    // FILES at planning time — the scan shows PartitionFilters and
    // reads only the matching month directories
    // (PartitionPruneSpec asserts files-read == matching partitions;
    // row-group stats pruning, the intra-file rung, is mt_skip_index /
    // scan_minmax). The write is part of the demonstrator, same class
    // as mt_formats / sql_ch_ctas_final — a deployment writes once and
    // prunes forever. repartition by the key → one file per month dir.
    QDef("mt_partition_prune", (s, dir) => {
      import s.implicits._
      val dest = s"${System.getProperty("java.io.tmpdir")}/graft_partprune_" +
        math.abs(dir.hashCode).toString
      if (!new java.io.File(s"$dest/_SUCCESS").exists())
        Tables(s, dir, "orders")
          .withColumn("o_month", date_format($"o_orderdate", "yyyy-MM"))
          .repartition($"o_month")
          .write.mode("overwrite").partitionBy("o_month").parquet(dest)
      s.read.parquet(dest)
        .filter($"o_month" >= "1995-01" && $"o_month" <= "1995-03")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"), Det.dsum($"o_totalprice").as("total"))
        .orderBy($"o_orderpriority")
    }, Some(s"""
      SELECT o_orderpriority, count(*) AS n,
             ${Det.sqlSum("o_totalprice")} AS total
      FROM orders
      WHERE strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m')
            BETWEEN '1995-01' AND '1995-03'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))
  )
}
