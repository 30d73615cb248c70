package graft.queries

import graft.{QDef, Tables}

/** The COMPLETE ClickBench suite — all 43 public queries (Q0–Q42 of
  * ClickBench/queries.sql, the benchmark the reference project
  * publishes as its headline workload [public docs: ClickBench;
  * SURVEY §6]) — re-expressed over the `events` fixture.
  *
  * The `hits` table's ~100 columns are mapped onto `events` through a
  * single derived view (`cb_hits`) whose column derivations are
  * SHARED TEXT between the Spark side and the DuckDB oracle: only the
  * JSON-extract and epoch-micros spellings differ (engine-specific
  * inner layer). Every derived integer is CAST to BIGINT in the view
  * and every sum/count is CAST to BIGINT in the queries, so dtypes
  * hash identically; every top-k ORDER BY carries the group keys as
  * tie-breaks (the driver hash-compares rows, so `ORDER BY c DESC`
  * alone would be nondeterministic under ties).
  *
  * Column mapping (hits → events-derived):
  *   WatchID→watch_id(event_id)  UserID→user_id  CounterID→counter_id
  *   AdvEngineID→adv_engine  RegionID→region_id  SearchPhrase→
  *   search_phrase  SearchEngineID→search_engine  MobilePhone[Model]→
  *   mobile_phone/mobile_model  URL/Title/Referer→url/title/referer
  *   ResolutionWidth→res_width  ClientIP→client_ip  IsRefresh/
  *   DontCountHits/IsLink/IsDownload→is_refresh/dont_count/is_link/
  *   is_download  TraficSourceID→trafic_src  URLHash/RefererHash→
  *   url_hash/referer_hash  WindowClientWidth/Height→window_w/h
  *   EventTime→event_us (µs — the repo's timestamp-compare contract)
  *   EventDate→event_date.
  *
  * Scale notes: every query is a single scan + hash agg (+ fused
  * TakeOrdered top-k); the heaviest are Q32 (GROUP BY watch_id,
  * client_ip over ALL rows — the high-cardinality shuffle CB uses to
  * stress partial aggregation) and Q29 (90 parallel sums — one pass,
  * map-side combine). Nothing here joins, so there is no broadcast /
  * skew concern; the plans survive any scale-up as long as the
  * partial-agg + shuffle-on-group-key pattern holds, which
  * `.explain` confirms (HashAggregate partial → Exchange → final).
  *
  * OFFSET values on Q38–Q42 are scaled down from the originals
  * (1000/100/10000) to the fixture's row counts so the result sets
  * stay non-degenerate; the shape (agg → sort → LIMIT n OFFSET m) is
  * preserved. Q17 (GROUP BY … LIMIT without ORDER BY in the
  * original) gains a total ORDER BY — required by the hash gate.
  */
object ClickBenchQueries {

  /** Engine-shared derived-column list (references the inner layer's
    * `k` / `us` / `event_date`). Everything ASCII, everything
    * deterministic, every int BIGINT.
    */
  private val outerCols: Seq[String] = Seq(
    "event_id AS watch_id",
    "user_id",
    "event_type",
    "value",
    "us AS event_us",
    "event_date",
    "CAST(k AS BIGINT) AS k",
    "CAST(event_id % 100 AS BIGINT) AS counter_id",
    "CAST(k % 5 AS BIGINT) AS adv_engine",
    "CAST(user_id % 7 AS BIGINT) AS region_id",
    "CAST(event_id % 5 AS BIGINT) AS search_engine",
    "CAST(event_id % 4 AS BIGINT) AS mobile_phone",
    "CASE WHEN event_id % 3 = 0 THEN event_type ELSE '' END AS mobile_model",
    "CASE WHEN event_id % 5 < 2 THEN event_type || ' ' || CAST(k AS STRING) " +
      "ELSE '' END AS search_phrase",
    "'https://' || CASE WHEN k % 10 = 3 THEN 'www.google.com' " +
      "ELSE 'example.com' END || '/' || event_type || '?k=' || " +
      "CAST(k AS STRING) AS url",
    "CASE WHEN k % 10 = 4 THEN 'Google results for ' || event_type " +
      "ELSE 'Page ' || CAST(k AS STRING) || ' about ' || event_type END AS title",
    "CASE WHEN k % 4 = 0 THEN '' ELSE 'https://ref' || CAST(k % 5 AS STRING) " +
      "|| '.example.org/' || event_type END AS referer",
    "CAST(800 + (event_id % 8) * 40 AS BIGINT) AS res_width",
    "CAST(167772160 + (user_id * 2654435761) % 1048576 AS BIGINT) AS client_ip",
    "CAST(CASE WHEN event_id % 11 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_refresh",
    "CAST(CASE WHEN event_id % 13 = 0 THEN 1 ELSE 0 END AS BIGINT) AS dont_count",
    "CAST(CASE WHEN event_id % 3 = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_link",
    "CAST(CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_download",
    "CAST((event_id % 9) - 1 AS BIGINT) AS trafic_src",
    "CAST((k * 131 + length(event_type)) % 100 AS BIGINT) AS url_hash",
    "CAST((k * 37 + user_id) % 50 AS BIGINT) AS referer_hash",
    "CAST(1000 + (k % 20) * 10 AS BIGINT) AS window_w",
    "CAST(700 + (k % 15) * 10 AS BIGINT) AS window_h")

  /** DuckDB spelling of the view (inner layer differs from Spark only
    * in json-extract + epoch-µs).
    */
  private val duckHitsCte: String =
    s"""cb_hits AS (
       |  SELECT ${outerCols.mkString(",\n    ")}
       |  FROM (SELECT *,
       |          CAST(json_extract_string(props, '$$.k') AS INT) AS k,
       |          epoch_us(CAST(ts AS TIMESTAMP)) AS us,
       |          CAST(ts AS DATE) AS event_date
       |        FROM events))""".stripMargin

  /** Spark spelling of the view (exposed for ClickBenchSqlSpec's
    * front-door run).
    */
  def hits(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir, "events")
      .selectExpr("*",
        "CAST(get_json_object(props, '$.k') AS INT) AS k",
        "unix_micros(ts) AS us",
        "CAST(ts AS DATE) AS event_date")
      .selectExpr(outerCols: _*)

  /** One ClickBench query: SHARED SQL text run by Spark over the temp
    * view and by DuckDB over the CTE — a dialect divergence is
    * impossible by construction (the gate hash-compares anyway).
    */
  private val suiteBuf =
    scala.collection.mutable.LinkedHashMap[String, String]()

  private def cbq(name: String, sharedSql: String): QDef = {
    suiteBuf(name) = sharedSql
    QDef(name,
      (s, dir) => {
        hits(s, dir).createOrReplaceTempView("cb_hits")
        s.sql(sharedSql)
      },
      Some(s"WITH $duckHitsCte $sharedSql"))
  }

  /** name → shared query text (for the front-door equivalence spec). */
  def suite: Map[String, String] = { val _ = defs; suiteBuf.toMap }

  // Q29's 90 structurally-distinct sums (sum(res_width + i)) — the
  // "many aggregates, one pass" stressor.
  private val q29Sums: String = (0 until 90)
    .map(i => s"CAST(sum(res_width + $i) AS BIGINT) AS s$i").mkString(", ")

  // the date window constants (fixtures span 2024-01-01..30)
  private val d1 = "DATE '2024-01-05'"
  private val d2 = "DATE '2024-01-20'"

  val defs: Seq[QDef] = Seq(
    cbq("cb43_q00", "SELECT CAST(count(*) AS BIGINT) AS c FROM cb_hits"),
    cbq("cb43_q01",
      "SELECT CAST(count(*) AS BIGINT) AS c FROM cb_hits WHERE adv_engine <> 0"),
    cbq("cb43_q02",
      """SELECT CAST(sum(adv_engine) AS BIGINT) AS s,
        |       CAST(count(*) AS BIGINT) AS c,
        |       avg(res_width) AS a FROM cb_hits""".stripMargin),
    cbq("cb43_q03", "SELECT avg(user_id) AS a FROM cb_hits"),
    cbq("cb43_q04",
      "SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS u FROM cb_hits"),
    cbq("cb43_q05",
      "SELECT CAST(count(DISTINCT search_phrase) AS BIGINT) AS u FROM cb_hits"),
    cbq("cb43_q06",
      "SELECT min(event_date) AS mn, max(event_date) AS mx FROM cb_hits"),
    cbq("cb43_q07",
      """SELECT adv_engine, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits WHERE adv_engine <> 0
        |GROUP BY adv_engine ORDER BY c DESC, adv_engine""".stripMargin),
    cbq("cb43_q08",
      """SELECT region_id, CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits GROUP BY region_id
        |ORDER BY u DESC, region_id LIMIT 10""".stripMargin),
    cbq("cb43_q09",
      """SELECT region_id, CAST(sum(adv_engine) AS BIGINT) AS s,
        |       CAST(count(*) AS BIGINT) AS c, avg(res_width) AS a,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits GROUP BY region_id
        |ORDER BY c DESC, region_id LIMIT 10""".stripMargin),
    cbq("cb43_q10",
      """SELECT mobile_model, CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits WHERE mobile_model <> ''
        |GROUP BY mobile_model ORDER BY u DESC, mobile_model LIMIT 10""".stripMargin),
    cbq("cb43_q11",
      """SELECT mobile_phone, mobile_model,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits WHERE mobile_model <> ''
        |GROUP BY mobile_phone, mobile_model
        |ORDER BY u DESC, mobile_phone, mobile_model LIMIT 10""".stripMargin),
    cbq("cb43_q12",
      """SELECT search_phrase, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits WHERE search_phrase <> ''
        |GROUP BY search_phrase ORDER BY c DESC, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q13",
      """SELECT search_phrase, CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits WHERE search_phrase <> ''
        |GROUP BY search_phrase ORDER BY u DESC, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q14",
      """SELECT search_engine, search_phrase, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits WHERE search_phrase <> ''
        |GROUP BY search_engine, search_phrase
        |ORDER BY c DESC, search_engine, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q15",
      """SELECT user_id, CAST(count(*) AS BIGINT) AS c FROM cb_hits
        |GROUP BY user_id ORDER BY c DESC, user_id LIMIT 10""".stripMargin),
    cbq("cb43_q16",
      """SELECT user_id, search_phrase, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits GROUP BY user_id, search_phrase
        |ORDER BY c DESC, user_id, search_phrase LIMIT 10""".stripMargin),
    // original Q17 has no ORDER BY (any 10 groups) — the hash gate
    // needs a total order, so the LIMIT rides a deterministic sort
    cbq("cb43_q17",
      """SELECT user_id, search_phrase, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits GROUP BY user_id, search_phrase
        |ORDER BY user_id, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q18",
      """SELECT user_id, CAST(floor(event_us / 60000000) AS BIGINT) % 60 AS m,
        |       search_phrase, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits GROUP BY user_id, m, search_phrase
        |ORDER BY c DESC, user_id, m, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q19",
      "SELECT user_id FROM cb_hits WHERE user_id = 7"),
    cbq("cb43_q20",
      """SELECT CAST(count(*) AS BIGINT) AS c FROM cb_hits
        |WHERE url LIKE '%google%'""".stripMargin),
    cbq("cb43_q21",
      """SELECT search_phrase, min(url) AS mu, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits WHERE url LIKE '%google%' AND search_phrase <> ''
        |GROUP BY search_phrase ORDER BY c DESC, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q22",
      """SELECT search_phrase, min(url) AS mu, min(title) AS mt,
        |       CAST(count(*) AS BIGINT) AS c,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS u
        |FROM cb_hits
        |WHERE title LIKE '%Google%' AND url NOT LIKE '%.google.%'
        |  AND search_phrase <> ''
        |GROUP BY search_phrase ORDER BY c DESC, search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q23",
      """SELECT * FROM cb_hits WHERE url LIKE '%google%'
        |ORDER BY event_us, watch_id LIMIT 10""".stripMargin),
    cbq("cb43_q24",
      """SELECT search_phrase FROM cb_hits WHERE search_phrase <> ''
        |ORDER BY event_us, watch_id LIMIT 10""".stripMargin),
    cbq("cb43_q25",
      """SELECT search_phrase FROM cb_hits WHERE search_phrase <> ''
        |ORDER BY search_phrase LIMIT 10""".stripMargin),
    cbq("cb43_q26",
      """SELECT search_phrase FROM cb_hits WHERE search_phrase <> ''
        |ORDER BY event_us, search_phrase LIMIT 10""".stripMargin),
    // HAVING threshold scaled to fixture group sizes (original: >100000)
    cbq("cb43_q27",
      """SELECT counter_id, avg(length(url)) AS l, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits WHERE url <> ''
        |GROUP BY counter_id HAVING count(*) > 5
        |ORDER BY l DESC, counter_id LIMIT 25""".stripMargin),
    cbq("cb43_q28",
      """SELECT regexp_extract(referer, '^https?://([^/]+)/', 1) AS dom,
        |       avg(length(referer)) AS l, CAST(count(*) AS BIGINT) AS c,
        |       min(referer) AS mr
        |FROM cb_hits WHERE referer <> ''
        |GROUP BY dom HAVING count(*) > 5
        |ORDER BY l DESC, dom LIMIT 25""".stripMargin),
    cbq("cb43_q29", s"SELECT $q29Sums FROM cb_hits"),
    cbq("cb43_q30",
      """SELECT search_engine, client_ip, CAST(count(*) AS BIGINT) AS c,
        |       CAST(sum(is_refresh) AS BIGINT) AS sr, avg(res_width) AS a
        |FROM cb_hits WHERE search_phrase <> ''
        |GROUP BY search_engine, client_ip
        |ORDER BY c DESC, search_engine, client_ip LIMIT 10""".stripMargin),
    cbq("cb43_q31",
      """SELECT watch_id, client_ip, CAST(count(*) AS BIGINT) AS c,
        |       CAST(sum(is_refresh) AS BIGINT) AS sr, avg(res_width) AS a
        |FROM cb_hits WHERE search_phrase <> ''
        |GROUP BY watch_id, client_ip
        |ORDER BY c DESC, watch_id, client_ip LIMIT 10""".stripMargin),
    // Q32: the full-table high-cardinality GROUP BY — CB's partial-agg
    // shuffle stressor (every row its own group here, as upstream)
    cbq("cb43_q32",
      """SELECT watch_id, client_ip, CAST(count(*) AS BIGINT) AS c,
        |       CAST(sum(is_refresh) AS BIGINT) AS sr, avg(res_width) AS a
        |FROM cb_hits GROUP BY watch_id, client_ip
        |ORDER BY c DESC, watch_id, client_ip LIMIT 10""".stripMargin),
    cbq("cb43_q33",
      """SELECT url, CAST(count(*) AS BIGINT) AS c FROM cb_hits
        |GROUP BY url ORDER BY c DESC, url LIMIT 10""".stripMargin),
    cbq("cb43_q34",
      """SELECT 1 AS one, url, CAST(count(*) AS BIGINT) AS c FROM cb_hits
        |GROUP BY one, url ORDER BY c DESC, url LIMIT 10""".stripMargin),
    cbq("cb43_q35",
      """SELECT client_ip, client_ip - 1 AS c1, client_ip - 2 AS c2,
        |       client_ip - 3 AS c3, CAST(count(*) AS BIGINT) AS c
        |FROM cb_hits
        |GROUP BY client_ip, client_ip - 1, client_ip - 2, client_ip - 3
        |ORDER BY c DESC, client_ip LIMIT 10""".stripMargin),
    cbq("cb43_q36",
      s"""SELECT url, CAST(count(*) AS BIGINT) AS pv FROM cb_hits
         |WHERE counter_id = 62 AND event_date >= $d1 AND event_date <= $d2
         |  AND dont_count = 0 AND is_refresh = 0 AND url <> ''
         |GROUP BY url ORDER BY pv DESC, url LIMIT 10""".stripMargin),
    cbq("cb43_q37",
      s"""SELECT title, CAST(count(*) AS BIGINT) AS pv FROM cb_hits
         |WHERE counter_id = 62 AND event_date >= $d1 AND event_date <= $d2
         |  AND dont_count = 0 AND is_refresh = 0 AND title <> ''
         |GROUP BY title ORDER BY pv DESC, title LIMIT 10""".stripMargin),
    cbq("cb43_q38",
      s"""SELECT url, CAST(count(*) AS BIGINT) AS pv FROM cb_hits
         |WHERE counter_id = 62 AND event_date >= $d1 AND event_date <= $d2
         |  AND is_refresh = 0 AND is_link <> 0 AND is_download = 0
         |GROUP BY url ORDER BY pv DESC, url LIMIT 10 OFFSET 5""".stripMargin),
    cbq("cb43_q39",
      s"""SELECT trafic_src, search_engine, adv_engine,
         |       CASE WHEN search_engine = 0 AND adv_engine = 0 THEN referer
         |            ELSE '' END AS src,
         |       url AS dst, CAST(count(*) AS BIGINT) AS pv
         |FROM cb_hits
         |WHERE counter_id = 62 AND event_date >= $d1 AND event_date <= $d2
         |  AND is_refresh = 0
         |GROUP BY trafic_src, search_engine, adv_engine,
         |         CASE WHEN search_engine = 0 AND adv_engine = 0 THEN referer
         |              ELSE '' END, url
         |ORDER BY pv DESC, trafic_src, search_engine, adv_engine, src, dst
         |LIMIT 10 OFFSET 5""".stripMargin),
    // Q40/Q41: the original's CounterID=62 + per-row-hash equality is
    // vacuous at fixture scale; counter predicate widened to a 10%
    // stripe, hash-bucket equality kept (same shape: selective
    // equality filters feeding a grouped top-k with OFFSET)
    cbq("cb43_q40",
      """SELECT url_hash, event_date, CAST(count(*) AS BIGINT) AS pv
        |FROM cb_hits
        |WHERE counter_id % 10 = 2 AND is_refresh = 0
        |  AND trafic_src IN (-1, 6) AND referer_hash = 43
        |GROUP BY url_hash, event_date
        |ORDER BY pv DESC, url_hash, event_date LIMIT 10 OFFSET 2""".stripMargin),
    cbq("cb43_q41",
      """SELECT window_w, window_h, CAST(count(*) AS BIGINT) AS pv
        |FROM cb_hits
        |WHERE counter_id % 10 = 2 AND is_refresh = 0 AND dont_count = 0
        |  AND url_hash = 27
        |GROUP BY window_w, window_h
        |ORDER BY pv DESC, window_w, window_h LIMIT 10 OFFSET 2""".stripMargin),
    cbq("cb43_q42",
      """SELECT event_us - event_us % 60000000 AS m,
        |       CAST(count(*) AS BIGINT) AS pv
        |FROM cb_hits
        |WHERE counter_id = 62
        |  AND event_date >= DATE '2024-01-10' AND event_date <= DATE '2024-01-20'
        |  AND is_refresh = 0 AND dont_count = 0
        |GROUP BY m ORDER BY m LIMIT 10 OFFSET 2""".stripMargin)
  )
}
