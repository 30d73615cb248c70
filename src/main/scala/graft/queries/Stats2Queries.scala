package graft.queries

import graft.{Det, QDef, Tables}
import org.apache.spark.sql.functions._

/** Round-7 additions to the §2.4 statistical-aggregate family:
  * meanZTest, analysisOfVariance (one-way ANOVA F), the A/B-test
  * planner minSampleSizeContinous, and groupArrayInsertAt.
  *
  * Determinism discipline (same as StatsQueries): every data-dependent
  * sum is an exact DECIMAL(22,6) lattice sum (associative, so
  * partition order and executor count cannot change it), and the final
  * double arithmetic is a FIXED expression tree written identically in
  * the Spark code and the DuckDB oracle — no double is ever summed in
  * engine-chosen order.
  */
object Stats2Queries {

  // Φ⁻¹(0.975) and Φ⁻¹(0.8): the standard normal quantiles for
  // α = 0.05 (two-sided) and power = 0.8. ClickHouse computes these
  // internally from (alpha, power); neither Spark nor DuckDB exposes
  // a probit, so both sides of the oracle pin the same literals.
  private val Z_ALPHA = "1.9599639845400545"
  private val Z_POWER = "0.8416212335729143"

  val defs: Seq[QDef] = Seq(

    // meanZTest: two-sample z statistic for returned ('R') vs
    // accepted ('A') extended price, population variances taken from
    // the data (σ² with /n, not /(n-1) — that is the z-test's "known
    // variance" contract). Same pivoted two-row shape as
    // agg_welch_ttest: per-group decimal sums, then one fixed-order
    // double expression.
    QDef("agg_mean_ztest", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val st = Tables(s, dir, "lineitem")
        .filter($"l_returnflag".isin("A", "R"))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sum($"l_extendedprice".cast(D)).cast("double").as("sx"),
          sum(($"l_extendedprice" * $"l_extendedprice").cast(D)).cast("double").as("sxx"))
        .withColumn("m", $"sx" / $"n")
        .withColumn("v", ($"sxx" - $"sx" * $"sx" / $"n") / $"n")
      val a = st.filter($"l_returnflag" === "A")
        .select($"n".as("n1"), $"m".as("m1"), $"v".as("v1"))
      val r = st.filter($"l_returnflag" === "R")
        .select($"n".as("n2"), $"m".as("m2"), $"v".as("v2"))
      a.crossJoin(r)
        .select(
          round($"m1", 4).as("mean_a"),
          round($"m2", 4).as("mean_r"),
          round(($"m1" - $"m2") / sqrt($"v1" / $"n1" + $"v2" / $"n2"), 4).as("z_stat"))
    }, Some("""
      WITH st AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sxx
        FROM lineitem WHERE l_returnflag IN ('A', 'R')
        GROUP BY l_returnflag),
      m AS (SELECT l_returnflag, n, sx / n AS m, (sxx - sx * sx / n) / n AS v
            FROM st)
      SELECT round(a.m, 4) AS mean_a, round(r.m, 4) AS mean_r,
             round((a.m - r.m) / sqrt(a.v / a.n + r.v / r.n), 4) AS z_stat
      FROM (SELECT * FROM m WHERE l_returnflag = 'A') a,
           (SELECT * FROM m WHERE l_returnflag = 'R') r""")),

    // analysisOfVariance (one-way ANOVA): F statistic for
    // o_totalprice across the five order priorities. The group set is
    // the KNOWN priority domain, so the per-group stats pivot into
    // fixed columns via conditional decimal aggregation — one scan,
    // one shuffle-free reduce, and the between/within sums of squares
    // combine in a fixed expression order (no engine-ordered double
    // sum anywhere). CH returns (F, p); the p-value needs the F CDF
    // which neither engine exposes — the df pair is emitted instead,
    // and Stats2Spec re-derives F naively in-memory to pin the math.
    QDef("agg_anova", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val o = Tables(s, dir, "orders")
      val aggs = pr.zipWithIndex.flatMap { case (p, i) =>
        Seq(
          count(when($"o_orderpriority" === p, lit(1))).cast("double").as(s"n$i"),
          sum(when($"o_orderpriority" === p, $"o_totalprice").cast(D)).cast("double").as(s"sx$i"),
          sum(when($"o_orderpriority" === p, $"o_totalprice" * $"o_totalprice").cast(D)).cast("double").as(s"sxx$i"))
      }
      val st = o.agg(aggs.head, aggs.tail: _*)
      val k = pr.size
      val nTot = (0 until k).map(i => col(s"n$i")).reduce(_ + _)
      val sxTot = (0 until k).map(i => col(s"sx$i")).reduce(_ + _)
      val gm = sxTot / nTot
      val ssb = (0 until k).map { i =>
        val d = col(s"sx$i") / col(s"n$i") - gm
        d * d * col(s"n$i")
      }.reduce(_ + _)
      val ssw = (0 until k).map { i =>
        col(s"sxx$i") - col(s"sx$i") * col(s"sx$i") / col(s"n$i")
      }.reduce(_ + _)
      st.select(
        round((ssb / lit(k - 1)) / (ssw / (nTot - lit(k))), 4).as("f_stat"),
        lit(k - 1).cast("long").as("df_between"),
        (nTot - lit(k)).cast("long").as("df_within"))
    }, Some {
      val pr = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val per = pr.zipWithIndex.map { case (p, i) =>
        s"""CAST(count(*) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE) AS n$i,
           CAST(sum(CAST(o_totalprice AS DECIMAL(22,6))) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE) AS sx$i,
           CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(22,6))) FILTER (WHERE o_orderpriority = '$p') AS DOUBLE) AS sxx$i"""
      }.mkString(",\n")
      val k = pr.size
      val nTot = (0 until k).map(i => s"n$i").mkString(" + ")
      val sxTot = (0 until k).map(i => s"sx$i").mkString(" + ")
      val ssb = (0 until k)
        .map(i => s"((sx$i / n$i - gm) * (sx$i / n$i - gm) * n$i)")
        .mkString(" + ")
      val ssw = (0 until k).map(i => s"(sxx$i - sx$i * sx$i / n$i)").mkString(" + ")
      s"""
      WITH st AS (SELECT $per FROM orders),
      g AS (SELECT *, ($sxTot) / ($nTot) AS gm, ($nTot) AS n_tot FROM st)
      SELECT round((($ssb) / ${k - 1}) / (($ssw) / (n_tot - $k)), 4) AS f_stat,
             CAST(${k - 1} AS BIGINT) AS df_between,
             CAST(n_tot - $k AS BIGINT) AS df_within
      FROM g"""
    }),

    // minSampleSizeContinous: the A/B-test planner — per returnflag,
    // the per-variant sample size needed to detect a 5% relative move
    // in mean extended price at α=0.05 / power=0.8:
    //   n = 2·(z_{1-α/2} + z_pow)²·σ² / (mde·baseline)².
    // baseline = group mean, σ² = population variance, both from the
    // same exact decimal sums as the z-test above.
    QDef("agg_min_sample_size", (s, dir) => {
      import s.implicits._
      val D = "decimal(22,6)"
      val mde = "0.05"
      Tables(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).cast("double").as("n"),
          sum($"l_extendedprice".cast(D)).cast("double").as("sx"),
          sum(($"l_extendedprice" * $"l_extendedprice").cast(D)).cast("double").as("sxx"))
        .withColumn("m", $"sx" / $"n")
        .withColumn("v", ($"sxx" - $"sx" * $"sx" / $"n") / $"n")
        .select($"l_returnflag",
          round(expr(s"2 * ($Z_ALPHA + $Z_POWER) * ($Z_ALPHA + $Z_POWER) * v" +
            s" / (($mde * m) * ($mde * m))"), 4).as("n_required"))
        .orderBy($"l_returnflag")
    }, Some(s"""
      WITH st AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(22,6))) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY l_returnflag),
      m AS (SELECT l_returnflag, sx / n AS m, (sxx - sx * sx / n) / n AS v FROM st)
      SELECT l_returnflag,
             round(2 * ($Z_ALPHA + $Z_POWER) * ($Z_ALPHA + $Z_POWER) * v
                   / ((0.05 * m) * (0.05 * m)), 4) AS n_required
      FROM m ORDER BY l_returnflag""")),

    // groupArrayInsertAt(0, 24)(cnt, hour): per event type, the
    // 24-slot hour-of-day histogram as a positional array. Positions
    // are made unique by pre-aggregating (event_type, hour) counts —
    // CH documents duplicate positions as pick-any, which is
    // nondeterministic, so the declared query aggregates first (the
    // deterministic subset of the contract). Two hash aggs, then a
    // map→fixed-length-array projection; no window, no explode.
    QDef("agg_array_insert_at", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .groupBy($"event_type", hour($"ts").cast("long").as("h"))
        .agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(map_from_entries(collect_list(struct($"h", $"c"))).as("m"))
        .select($"event_type",
          array_join(transform(sequence(lit(0L), lit(23L)),
            h => coalesce(element_at($"m", h), lit(0L))), "|").as("hour_counts"))
        .orderBy($"event_type")
    }, Some("""
      WITH hc AS (
        SELECT event_type,
               CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS h,
               count(*) AS c
        FROM events GROUP BY event_type, h),
      gh AS (SELECT g.event_type, s.h
             FROM (SELECT DISTINCT event_type FROM events) g
             CROSS JOIN (SELECT unnest(generate_series(0, 23)) AS h) s),
      j AS (SELECT gh.event_type, gh.h, CAST(coalesce(hc.c, 0) AS BIGINT) AS c
            FROM gh LEFT JOIN hc ON hc.event_type = gh.event_type AND hc.h = gh.h)
      SELECT event_type, array_to_string(list(c ORDER BY h), '|') AS hour_counts
      FROM j GROUP BY event_type ORDER BY event_type""")),

    // nonNegativeDerivative(value, ts) — CH's monitoring-counter rate
    // window function: per-user rate of `value` per second, clamped
    // at zero, first row and zero-dt rows defined as 0 (deterministic
    // tie-break on event_id). The per-row doubles are IEEE-identical
    // across engines (one division, no reordered sums), then the
    // per-type rollup goes through the decimal lattice as usual.
    // Window is PARTITIONed by user_id — never global — so it scales.
    QDef("window_nn_derivative", (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      Tables(s, dir, "events")
        .select($"event_type", $"user_id", $"event_id", $"value",
          unix_micros($"ts").as("us"))
        .withColumn("pv", lag($"value", 1).over(w))
        .withColumn("pus", lag($"us", 1).over(w))
        .withColumn("rate",
          when($"pus".isNull || ($"us" - $"pus") <= 0, lit(0.0))
            .otherwise(greatest(lit(0.0),
              ($"value" - $"pv") / (($"us" - $"pus") / lit(1000000.0)))))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), Det.dsum($"rate").as("rate_sum"))
        .orderBy($"event_type")
    }, Some(s"""
      WITH w AS (
        SELECT event_type, value,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pv,
               lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pus
        FROM events),
      r AS (
        SELECT event_type,
               CASE WHEN pus IS NULL OR us - pus <= 0 THEN 0.0
                    ELSE greatest(0.0, (value - pv) / ((us - pus) / 1000000.0))
               END AS rate
        FROM w)
      SELECT event_type, count(*) AS n, ${Det.sqlSum("rate")} AS rate_sum
      FROM r GROUP BY event_type ORDER BY event_type"""))
  )
}
