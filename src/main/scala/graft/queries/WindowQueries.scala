package graft.queries

import graft.{QDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SURVEY.md §2.5: the window-function surface (upstream anchor
  * src/Processors/Transforms/WindowTransform.cpp). All Spark builtins;
  * every window spec carries a deterministic total order (unique
  * tie-break key) so results hash-match the oracle.
  */
object WindowQueries {

  val defs: Seq[QDef] = Seq(

    // row_number / rank / dense_rank per customer by order price.
    QDef("window_rank", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      Tables(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter($"rn" <= 3)
        .orderBy($"o_custkey", $"rn")
    }, Some("""
      SELECT * FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rn <= 3 ORDER BY o_custkey, rn""")),

    // Frame aggregates: running total + 3-row moving average.
    QDef("window_frames", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, 0)
      Tables(s, dir, "events")
        .select($"user_id", unix_micros($"ts").as("ts_us"),
          round(sum($"value").over(run), 4).as("running_sum"),
          round(avg($"value").over(mov), 4).as("moving_avg3"))
        .orderBy($"user_id", $"ts_us")
    }, Some("""
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
             round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
      FROM events ORDER BY user_id, ts_us""")),

    // lag/lead: inter-event gap in seconds per user.
    QDef("window_lag_lead", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir, "events")
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("ts_us"),
          (unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w)).as("gap_us"),
          lead($"event_type", 1).over(w).as("next_type"))
        .orderBy($"user_id", $"ts_us")
    }, Some("""
      SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)), 1)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
             lead(event_type, 1)
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      FROM events ORDER BY user_id, ts_us""")),

    // first_value / last_value / nth_value with an explicit full frame
    // (constant per partition, folded to one row per user via min()).
    QDef("window_first_last", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables(s, dir, "events")
        .select($"user_id",
          first($"event_type").over(w).as("first_type"),
          last($"event_type").over(w).as("last_type"),
          nth_value($"event_type", 2).over(w).as("second_type"))
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"),
          min($"first_type").as("first_type"),
          min($"last_type").as("last_type"),
          min($"second_type").as("second_type"))
        .orderBy($"user_id")
    }, Some("""
      SELECT user_id, count(*) AS n,
             min(first_type) AS first_type,
             min(last_type) AS last_type,
             min(second_type) AS second_type
      FROM (
        SELECT user_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER w AS last_type,
               nth_value(event_type, 2) OVER w AS second_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
      GROUP BY user_id ORDER BY user_id""")),

    // ntile / percent_rank / cume_dist over customer balances,
    // PARTITIONED by nation: a global (unpartitioned) window would
    // funnel every row into one task at 100× scale. Global quantile
    // buckets, when needed, are a two-pass width_bucket aggregation —
    // see agg_histogram in AggQueries.
    QDef("window_ntile", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal", $"c_custkey")
      Tables(s, dir, "customer")
        .select($"c_custkey", $"c_nationkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .orderBy($"c_custkey")
    }, Some("""
      SELECT c_custkey, c_nationkey,
             ntile(4) OVER w AS quartile,
             round(percent_rank() OVER w, 4) AS pr,
             round(cume_dist() OVER w, 4) AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey""")),

    // QUALIFY emulation (§2.2): post-window filter — top spender per nation.
    QDef("window_qualify", (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"c_nationkey")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables(s, dir, "customer")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"c_nationkey", $"c_custkey", $"c_acctbal")
        .orderBy($"c_nationkey")
    }, Some("""
      SELECT c_nationkey, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_nationkey
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) WHERE rn = 1
      ORDER BY c_nationkey"""))
  )
}
