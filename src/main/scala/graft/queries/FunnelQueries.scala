package graft.queries

import graft.{QDef, Tables}
import graft.ops.Aggregates
import org.apache.spark.sql.functions._

/** SURVEY.md §2.4 "A"-row signature aggregates over the events
  * fixture (its view→click→purchase chains are purpose-built for
  * this): windowFunnel, sequenceMatch, topK — all custom
  * `Aggregator[IN,BUF,OUT]`s from [[graft.ops.Aggregates]], run
  * through Spark's normal partial/final two-phase aggregation.
  *
  * The DuckDB oracles restate the semantics relationally
  * (exists-chain joins / exact top-k) — two independent
  * implementations agreeing is the point of the gate. Timestamps
  * compare in µs on both sides (events.ts is ns in parquet; Spark
  * truncates to µs, the oracle casts identically).
  */
object FunnelQueries {

  private val stepExpr =
    when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)
      .otherwise(0)

  val defs: Seq[QDef] = Seq(

    // windowFunnel(7 days)(view → click → purchase) per user.
    QDef("funnel_window", (s, dir) => {
      import s.implicits._
      val wf = udaf(new Aggregates.WindowFunnel(7L * 86400L * 1000000L, 3))
      Tables(s, dir, "events")
        .withColumn("step", stepExpr)
        .filter($"step" > 0)
        .select($"user_id", unix_micros($"ts").as("tsUs"), $"step")
        .groupBy($"user_id")
        .agg(wf($"tsUs", $"step").as("depth"))
        .orderBy($"user_id")
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
             AND p.us - v.us <= 604800000000)
      SELECT u.user_id,
             CASE WHEN u.user_id IN (SELECT user_id FROM d3) THEN 3
                  WHEN u.user_id IN (SELECT user_id FROM d2) THEN 2
                  WHEN u.user_id IN (SELECT user_id FROM d1) THEN 1
                  ELSE 0 END AS depth
      FROM (SELECT DISTINCT user_id FROM e
            WHERE event_type IN ('view', 'click', 'purchase')) u
      ORDER BY u.user_id""")),

    // sequenceMatch('(?view).*(?signup).*(?purchase)') per user —
    // strict temporal order, no window bound.
    QDef("funnel_sequence", (s, dir) => {
      import s.implicits._
      val sm = udaf(new Aggregates.SequenceMatch(3))
      val step = when($"event_type" === "view", 1)
        .when($"event_type" === "signup", 2)
        .when($"event_type" === "purchase", 3)
        .otherwise(0)
      Tables(s, dir, "events")
        .withColumn("step", step)
        .filter($"step" > 0)
        .select($"user_id", unix_micros($"ts").as("tsUs"), $"step")
        .groupBy($"user_id")
        .agg(sm($"tsUs", $"step").as("matched"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                 FROM events)
      SELECT u.user_id,
             EXISTS (SELECT 1 FROM e v
                     JOIN e s2 ON s2.user_id = v.user_id
                       AND s2.event_type = 'signup' AND s2.us > v.us
                     JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > s2.us
                     WHERE v.user_id = u.user_id AND v.event_type = 'view')
               AS matched
      FROM (SELECT DISTINCT user_id FROM e
            WHERE event_type IN ('view', 'signup', 'purchase')) u
      ORDER BY u.user_id""")),

    // sequenceMatch with TIME-BOUND transitions — the pattern
    // dialect's `(?t<=N)` / `(?t>N)` conditions:
    //   matched:        '(?view)(?t<=3d)(?click)(?t<=10d)(?purchase)'
    //   matched_spaced: '(?view)(?t>1d)(?purchase)'
    // The oracle restates both as exists-chain joins with explicit
    // µs gap predicates.
    QDef("funnel_sequence_timed", (s, dir) => {
      import s.implicits._
      val d = 86400000000L // one day in µs
      val timed = udaf(new Aggregates.SequenceMatchTimed(3,
        Seq(3 * d, 10 * d), Seq(-1L, -1L)))
      val spaced = udaf(new Aggregates.SequenceMatchTimed(2,
        Seq(Long.MaxValue), Seq(d)))
      val step3 = when($"event_type" === "view", 1)
        .when($"event_type" === "click", 2)
        .when($"event_type" === "purchase", 3)
        .otherwise(0)
      val step2 = when($"event_type" === "view", 1)
        .when($"event_type" === "purchase", 2)
        .otherwise(0)
      Tables(s, dir, "events")
        .withColumn("step3", step3).withColumn("step2", step2)
        .filter($"step3" > 0)
        .select($"user_id", unix_micros($"ts").as("tsUs"), $"step3", $"step2")
        .groupBy($"user_id")
        .agg(timed($"tsUs", $"step3").as("matched"),
          spaced($"tsUs", $"step2").as("matched_spaced"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                 FROM events)
      SELECT u.user_id,
             EXISTS (SELECT 1 FROM e v
                     JOIN e c ON c.user_id = v.user_id
                       AND c.event_type = 'click' AND c.us > v.us
                       AND c.us - v.us <= 259200000000
                     JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > c.us
                       AND p.us - c.us <= 864000000000
                     WHERE v.user_id = u.user_id AND v.event_type = 'view')
               AS matched,
             EXISTS (SELECT 1 FROM e v
                     JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase'
                       AND p.us - v.us > 86400000000
                     WHERE v.user_id = u.user_id AND v.event_type = 'view')
               AS matched_spaced
      FROM (SELECT DISTINCT user_id FROM e
            WHERE event_type IN ('view', 'click', 'purchase')) u
      ORDER BY u.user_id""")),

    // windowFunnel STRICT MODES (7-day window, view → click →
    // purchase): depth under 'strict_increase' (chain timestamps
    // strictly increase), 'strict_order' (no event of any kind
    // between consecutive chain events — contiguous in the stream;
    // step-0 "other" events interrupt too), and 'strict_dedup' (a
    // repeat of an already-matched condition between chain events
    // interrupts). The oracle restates each mode as exists-chains
    // with NOT EXISTS interrupter predicates on open µs intervals.
    // sequenceMatch driven by VERBATIM pattern-DSL strings — the
    // parser front door over the timed/contiguity machinery
    // (ops/Aggregates.SeqPattern). Three dialect features on the
    // (view=1, purchase=2) conditions:
    //   pat_adjacent '(?1)(?2)'        — CH's no-skip rule: no event
    //     matching a DECLARED condition between the chain events
    //   pat_skip     '(?1).*(?2)'      — skipping allowed
    //   pat_timed    '(?1)(?t<=86400)(?2)' — adjacency + ≤1 day gap
    // The oracle restates each as exists-chains with NOT EXISTS
    // betweenness where adjacency applies.
    QDef("funnel_sequence_pattern", (s, dir) => {
      import s.implicits._
      val adj = udaf(new Aggregates.SequenceMatchPattern("(?1)(?2)", 2))
      val skip = udaf(new Aggregates.SequenceMatchPattern("(?1).*(?2)", 2))
      val timed = udaf(new Aggregates.SequenceMatchPattern("(?1)(?t<=86400)(?2)", 2))
      val step2 = when($"event_type" === "view", 1)
        .when($"event_type" === "purchase", 2)
        .otherwise(0)
      Tables(s, dir, "events")
        .withColumn("step", step2)
        .filter($"step" > 0)
        .select($"user_id", unix_micros($"ts").as("tsUs"), $"step")
        .groupBy($"user_id")
        .agg(adj($"tsUs", $"step").as("pat_adjacent"),
          skip($"tsUs", $"step").as("pat_skip"),
          timed($"tsUs", $"step").as("pat_timed"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type
                 FROM events WHERE event_type IN ('view', 'purchase')),
      u AS (SELECT DISTINCT user_id FROM e)
      SELECT u.user_id,
             EXISTS (SELECT 1 FROM e v JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > v.us
                     WHERE v.user_id = u.user_id AND v.event_type = 'view'
                       AND NOT EXISTS (SELECT 1 FROM e m
                                       WHERE m.user_id = v.user_id
                                         AND m.us > v.us AND m.us < p.us))
               AS pat_adjacent,
             EXISTS (SELECT 1 FROM e v JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > v.us
                     WHERE v.user_id = u.user_id AND v.event_type = 'view')
               AS pat_skip,
             EXISTS (SELECT 1 FROM e v JOIN e p ON p.user_id = v.user_id
                       AND p.event_type = 'purchase' AND p.us > v.us
                       AND p.us - v.us <= 86400000000
                     WHERE v.user_id = u.user_id AND v.event_type = 'view'
                       AND NOT EXISTS (SELECT 1 FROM e m
                                       WHERE m.user_id = v.user_id
                                         AND m.us > v.us AND m.us < p.us))
               AS pat_timed
      FROM u ORDER BY u.user_id""")),

    QDef("funnel_window_strict", (s, dir) => {
      import s.implicits._
      val W = 7L * 86400L * 1000000L
      val inc = udaf(new Aggregates.WindowFunnelModes(W, 3, strictIncrease = true))
      val ord = udaf(new Aggregates.WindowFunnelModes(W, 3, strictOrder = true))
      val ded = udaf(new Aggregates.WindowFunnelModes(W, 3, strictDedup = true))
      Tables(s, dir, "events")
        .withColumn("step", stepExpr) // others → 0, kept as interrupters
        .select($"user_id", unix_micros($"ts").as("tsUs"), $"step")
        .groupBy($"user_id")
        .agg(inc($"tsUs", $"step").as("d_inc"),
          ord($"tsUs", $"step").as("d_order"),
          ded($"tsUs", $"step").as("d_dedup"))
        .orderBy($"user_id")
    }, Some("""
      WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                        CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                                        WHEN 'purchase' THEN 3 ELSE 0 END AS step
                 FROM events),
      W AS (SELECT 604800000000 AS w)
      SELECT u.user_id,
        CASE WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us > v.us
                          JOIN e p ON p.user_id = v.user_id AND p.step = 3
                            AND p.us > c.us AND p.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1
                            AND c.us - v.us <= (SELECT w FROM W)) THEN 3
             WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us > v.us
                            AND c.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1) THEN 2
             WHEN EXISTS (SELECT 1 FROM e v WHERE v.user_id = u.user_id
                            AND v.step = 1) THEN 1
             ELSE 0 END AS d_inc,
        -- strict_order/strict_dedup allow TIED chain timestamps
        -- (only strict_increase forbids them — WindowFunnelModes'
        -- declarative reading, property-tested vs brute force), so
        -- these chains join on >=; the betweenness interrupts stay
        -- strict, which is vacuously satisfied inside a tie.
        CASE WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us >= v.us
                            AND c.us - v.us <= (SELECT w FROM W)
                          JOIN e p ON p.user_id = v.user_id AND p.step = 3
                            AND p.us >= c.us AND p.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id
                                AND x.us > v.us AND x.us < c.us)
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id
                                AND x.us > c.us AND x.us < p.us)) THEN 3
             WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us >= v.us
                            AND c.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id
                                AND x.us > v.us AND x.us < c.us)) THEN 2
             WHEN EXISTS (SELECT 1 FROM e v WHERE v.user_id = u.user_id
                            AND v.step = 1) THEN 1
             ELSE 0 END AS d_order,
        CASE WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us >= v.us
                            AND c.us - v.us <= (SELECT w FROM W)
                          JOIN e p ON p.user_id = v.user_id AND p.step = 3
                            AND p.us >= c.us AND p.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id AND x.step = 1
                                AND x.us > v.us AND x.us < c.us)
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id AND x.step IN (1, 2)
                                AND x.us > c.us AND x.us < p.us)) THEN 3
             WHEN EXISTS (SELECT 1 FROM e v JOIN e c ON c.user_id = v.user_id
                            AND c.step = 2 AND c.us >= v.us
                            AND c.us - v.us <= (SELECT w FROM W)
                          WHERE v.user_id = u.user_id AND v.step = 1
                            AND NOT EXISTS (SELECT 1 FROM e x
                              WHERE x.user_id = v.user_id AND x.step = 1
                                AND x.us > v.us AND x.us < c.us)) THEN 2
             WHEN EXISTS (SELECT 1 FROM e v WHERE v.user_id = u.user_id
                            AND v.step = 1) THEN 1
             ELSE 0 END AS d_dedup
      FROM (SELECT DISTINCT user_id FROM e) u
      ORDER BY u.user_id""")),

    // topKWeighted(2)(priority, revenue-cents): heavy hitters by TOTAL
    // WEIGHT via weighted SpaceSaving — capacity 16 ≥ the 5 distinct
    // priorities, so the sketch is exact and the groupBy/sum oracle
    // applies. Weights are o_totalprice in integer cents (2dp money →
    // exact BIGINT on both engines, no FP sum-order dependence).
    QDef("funnel_topk_weighted", (s, dir) => {
      import s.implicits._
      val tkw = udaf(new Aggregates.TopKWeighted(2, 16))
      Tables(s, dir, "orders")
        .withColumn("cents", expr("CAST(round(o_totalprice * 100, 0) AS BIGINT)"))
        .groupBy($"o_orderstatus")
        .agg(tkw($"o_orderpriority", $"cents").as("top"))
        .select($"o_orderstatus", posexplode($"top").as(Seq("i", "e")))
        .select($"o_orderstatus", ($"i" + 1).as("rank"),
          $"e.v".as("priority"), $"e.c".as("cents"))
        .orderBy($"o_orderstatus", $"rank")
    }, Some("""
      SELECT o_orderstatus, rank, priority, cents FROM (
        SELECT o_orderstatus, o_orderpriority AS priority,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
               row_number() OVER (PARTITION BY o_orderstatus
                 ORDER BY sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) DESC,
                          o_orderpriority) AS rank
        FROM orders GROUP BY o_orderstatus, o_orderpriority)
      WHERE rank <= 2 ORDER BY o_orderstatus, rank""")),

    // topK(2) event types per user via the SpaceSaving sketch —
    // capacity 8 ≥ the 5 distinct types, so the sketch is exact and
    // the exact-rewrite oracle applies.
    QDef("funnel_topk", (s, dir) => {
      import s.implicits._
      val tk = udaf(new Aggregates.TopK(2, 8))
      Tables(s, dir, "events")
        .groupBy($"user_id")
        .agg(tk($"event_type").as("top"))
        .select($"user_id", posexplode($"top").as(Seq("i", "e")))
        .select($"user_id", ($"i" + 1).as("rank"), $"e.v".as("etype"), $"e.c".as("cnt"))
        .orderBy($"user_id", $"rank")
    }, Some("""
      SELECT user_id, rank, etype, cnt FROM (
        SELECT user_id, event_type AS etype, count(*) AS cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type) AS rank
        FROM events GROUP BY user_id, event_type)
      WHERE rank <= 2 ORDER BY user_id, rank""")),

    // sequenceNextNode(direction, base)(ts, event_type, …): per user,
    // the event AFTER the first consecutive view→click pair (forward/
    // first_match) and the event chronologically BEFORE the newest
    // click→purchase adjacency (backward/first_match). Pure HOF scan
    // over the per-user sorted event list — no UDAF (ops/Sequences).
    // Oracle restates both scans with DuckDB list lambdas over the
    // same (ts, event_id)-ordered list.
    QDef("funnel_next_node", (s, dir) => {
      import s.implicits._
      val evs = Tables(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
          $"event_type".as("et"))
      evs.groupBy($"user_id")
        .agg(sort_array(collect_list(struct($"us", $"event_id", $"et")))
          .as("l"))
        .select($"user_id",
          graft.ops.Sequences.nextNode($"l", Seq("view", "click"),
            "forward", "first_match").as("next_fwd"),
          graft.ops.Sequences.nextNode($"l", Seq("purchase", "click"),
            "backward", "first_match").as("prev_bwd"))
        .orderBy($"user_id")
    }, Some("""
      WITH seqs AS (
        SELECT user_id,
               list(event_type ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
                    event_id) AS l
        FROM events GROUP BY user_id),
      m AS (
        SELECT user_id, l, list_reverse(l) AS lr,
               list_filter(range(1, len(l)),
                 i -> l[i] = 'view' AND l[i + 1] = 'click') AS fi,
               list_filter(range(1, len(l)),
                 i -> list_reverse(l)[i] = 'purchase'
                  AND list_reverse(l)[i + 1] = 'click') AS bi
        FROM seqs)
      SELECT user_id,
             CASE WHEN len(fi) > 0 AND fi[1] + 2 <= len(l)
                  THEN l[fi[1] + 2] END AS next_fwd,
             CASE WHEN len(bi) > 0 AND bi[1] + 2 <= len(lr)
                  THEN lr[bi[1] + 2] END AS prev_bwd
      FROM m ORDER BY user_id"""))
  )
}
