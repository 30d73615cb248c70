package graft.queries

import graft.{Det, Graft, QDef, Tables}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 scalar function families, one declared query per
  * family over the fixture built for it (events.props → JSON,
  * events.ts → date/time, documents.text → string/array lambdas).
  * All Spark builtins / higher-order functions — no UDFs, so every
  * expression stays inside whole-stage codegen.
  */
object ScalarQueries {

  val defs: Seq[QDef] = Seq(

    // JSON family on events.props (purpose-built fixture):
    // get_json_object ≈ CH JSONExtract*.
    QDef("scalar_json", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("int"))
        .groupBy($"event_type")
        .agg(count($"k").as("n_with_k"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, count(k) AS n_with_k, CAST(sum(k) AS BIGINT) AS sum_k,
             min(k) AS min_k, max(k) AS max_k
      FROM (SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events)
      GROUP BY event_type ORDER BY event_type""")),

    // Date/time family: date_trunc rollup (toStartOfMonth), extracts,
    // ISO weekday (Spark weekday()+1 == DuckDB isodow).
    QDef("scalar_datetime", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .withColumn("month", date_trunc("month", $"ts").cast("date"))
        .withColumn("isodow", weekday($"ts") + lit(1))
        .groupBy($"month")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("u_users"),
          sum($"isodow").as("dow_sum"),
          min(dayofmonth($"ts")).as("first_dom"),
          max(hour($"ts")).as("max_hour"))
        .orderBy($"month")
    }, Some("""
      SELECT month, count(*) AS n, count(DISTINCT user_id) AS u_users,
             CAST(sum(isodow) AS BIGINT) AS dow_sum,
             min(dom) AS first_dom, max(hr) AS max_hour
      FROM (SELECT CAST(date_trunc('month', CAST(ts AS TIMESTAMP)) AS DATE) AS month,
                   isodow(ts) AS isodow, dayofmonth(ts) AS dom, hour(ts) AS hr,
                   user_id
            FROM events)
      GROUP BY month ORDER BY month""")),

    // Round-7 probe-driven breadth, oracle-checked: replaceOne
    // (first-occurrence), format('{}'), clamp, SHA256 binary contract
    // (hex'd for the compare), halfMD5 (big-endian first 8 MD5 bytes
    // as a signed long — the DuckDB twin folds the hex in two 32-bit
    // halves through HUGEINT and wraps to two's complement).
    QDef("scalar_r7_breadth", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT doc_id,
               replaceOne(text, 'a', '#') AS r1,
               format('{}|{}', lang, source) AS fm,
               clamp(n_chars, 150, 300) AS cl,
               hex(SHA256(substring(text, 1, 16))) AS sh,
               halfMD5(substring(text, 1, 16)) AS hm
        FROM documents WHERE doc_id % 25 = 0 ORDER BY doc_id""")
    }, Some("""
      WITH base AS (
        SELECT doc_id, text, lang, source, n_chars,
               md5(substring(text, 1, 16)) AS m
        FROM documents WHERE doc_id % 25 = 0),
      halves AS (
        SELECT *, CAST(CAST(('0x' || substring(m, 1, 8)) AS BIGINT) AS HUGEINT)
                    * 4294967296::HUGEINT
                  + CAST(('0x' || substring(m, 9, 8)) AS BIGINT) AS h
        FROM base)
      SELECT doc_id,
             CASE WHEN strpos(text, 'a') > 0
                  THEN substr(text, 1, strpos(text, 'a') - 1) || '#' ||
                       substr(text, strpos(text, 'a') + 1)
                  ELSE text END AS r1,
             format('{}|{}', lang, source) AS fm,
             least(greatest(n_chars, 150), 300) AS cl,
             upper(sha256(substring(text, 1, 16))) AS sh,
             CAST(CASE WHEN h >= 9223372036854775808::HUGEINT
                       THEN h - 18446744073709551616::HUGEINT
                       ELSE h END AS BIGINT) AS hm
      FROM halves ORDER BY doc_id""")),

    // CH date-arithmetic spellings, oracle-checked: add/subtract-unit
    // family (month-end clamping included), Monday/Sunday week starts,
    // quarter — DuckDB twins via INTERVAL arithmetic and Monday-based
    // date_trunc('week').
    QDef("scalar_date_arith", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT o_orderkey,
               addDays(toDate(o_orderdate), 40) AS plus40,
               addMonths(toDate(o_orderdate), 1) AS plus1m,
               subtractDays(toDate(o_orderdate), 7) AS minus7,
               toMonday(toDate(o_orderdate)) AS monday,
               toStartOfWeek(toDate(o_orderdate)) AS sunday,
               toLastDayOfWeek(toDate(o_orderdate)) AS saturday,
               toQuarter(toDate(o_orderdate)) AS q
        FROM orders WHERE o_orderkey % 500 = 0
        ORDER BY o_orderkey""")
    }, Some("""
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 40 DAY AS DATE) AS plus40,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus1m,
             CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE) AS minus7,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE) AS monday,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE) + INTERVAL 1 DAY)
                  - INTERVAL 1 DAY AS DATE) AS sunday,
             CAST(date_trunc('week', CAST(o_orderdate AS DATE) + INTERVAL 1 DAY)
                  + INTERVAL 5 DAY AS DATE) AS saturday,
             CAST(quarter(CAST(o_orderdate AS DATE)) AS INT) AS q
      FROM orders WHERE o_orderkey % 500 = 0
      ORDER BY o_orderkey""")),

    // CH vector-distance family over real embeddings, oracle-checked:
    // every function is an index-order fold of exact float→double
    // terms, and the DuckDB twins spell the identical IEEE sequence
    // (list_transform + list_sum in list order), so values match to
    // the last bit — rounding is belt-and-braces only.
    QDef("scalar_vector_dist", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT a.vec_id,
               round(dotProduct(a.embedding, b.embedding), 6) AS dp,
               round(L1Distance(a.embedding, b.embedding), 6) AS l1,
               round(L2Distance(a.embedding, b.embedding), 6) AS l2,
               round(LinfDistance(a.embedding, b.embedding), 6) AS linf,
               round(L2Norm(a.embedding), 6) AS n2,
               round(cosineDistance(a.embedding, b.embedding), 6) AS cd
        FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 40 = 0
        ORDER BY a.vec_id""")
    }, Some("""
      SELECT a.vec_id AS vec_id,
             round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS dp,
             round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
               p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6) AS l1,
             round(sqrt(list_sum(list_transform(list_zip(a.embedding, b.embedding),
               p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                  * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))), 6) AS l2,
             round(list_max(list_transform(list_zip(a.embedding, b.embedding),
               p -> abs(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 6) AS linf,
             round(sqrt(list_sum(list_transform(a.embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS n2,
             round(1.0 - list_sum(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                 / (sqrt(list_sum(list_transform(a.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(b.embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cd
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id % 40 = 0
      ORDER BY vec_id""")),

    // String family: length/case/substring/position/replace/pad/trim/
    // split/reverse/translate/concat_ws over nation names (25 rows at
    // every SF — pure projection demo).
    QDef("scalar_string", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "nation").select(
        $"n_nationkey",
        length($"n_name").as("len"),
        lower($"n_name").as("lo"),
        substring($"n_name", 1, 3).as("pre3"),
        instr($"n_name", "A").as("pos_a"),
        regexp_replace($"n_name", "A", "@").as("repl"),
        lpad($"n_name", 12, ".").as("padded"),
        reverse($"n_name").as("rev"),
        translate($"n_name", "AEI", "431").as("leet"),
        concat_ws("-", lit("n"), $"n_name").as("tagged"),
        size(split($"n_name", " ")).as("words"))
        .orderBy($"n_nationkey")
    }, Some("""
      SELECT n_nationkey, length(n_name) AS len, lower(n_name) AS lo,
             substring(n_name, 1, 3) AS pre3,
             strpos(n_name, 'A') AS pos_a,
             replace(n_name, 'A', '@') AS repl,
             lpad(n_name, 12, '.') AS padded,
             reverse(n_name) AS rev,
             translate(n_name, 'AEI', '431') AS leet,
             concat_ws('-', 'n', n_name) AS tagged,
             len(string_split(n_name, ' ')) AS words
      FROM nation ORDER BY n_nationkey""")),

    // String similarity: levenshtein distance over the bounded
    // nation×region cross (125 rows at every SF).
    QDef("scalar_levenshtein", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "nation").crossJoin(Tables(s, dir, "region"))
        .select($"n_name", $"r_name",
          levenshtein($"n_name", $"r_name").as("lev"))
        .orderBy($"n_name", $"r_name")
    }, Some("""
      SELECT n_name, r_name, levenshtein(n_name, r_name) AS lev
      FROM nation CROSS JOIN region ORDER BY n_name, r_name""")),

    // Array family + higher-order lambdas on documents.text tokens:
    // size / distinct / filter / transform / aggregate (fold).
    QDef("scalar_array", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .withColumn("toks", split($"text", " "))
        .select($"lang",
          size($"toks").as("n_tok"),
          size(array_distinct($"toks")).as("n_uniq"),
          expr("size(filter(toks, t -> length(t) > 5))").as("n_long"),
          expr("aggregate(toks, 0, (a, t) -> a + length(t))").as("chars"),
          expr("array_max(transform(toks, t -> length(t)))").as("max_len"))
        .groupBy($"lang")
        .agg(sum($"n_tok").as("tokens"), sum($"n_uniq").as("uniq_tokens"),
          sum($"n_long").as("long_tokens"), sum($"chars").as("token_chars"),
          max($"max_len").as("longest"))
        .orderBy($"lang")
    }, Some("""
      SELECT lang, CAST(sum(n_tok) AS BIGINT) AS tokens,
             CAST(sum(n_uniq) AS BIGINT) AS uniq_tokens,
             CAST(sum(n_long) AS BIGINT) AS long_tokens,
             CAST(sum(chars) AS BIGINT) AS token_chars,
             max(max_len) AS longest
      FROM (SELECT lang,
                   len(toks) AS n_tok,
                   len(list_distinct(toks)) AS n_uniq,
                   len(list_filter(toks, t -> length(t) > 5)) AS n_long,
                   list_sum(list_transform(toks, t -> length(t))) AS chars,
                   list_max(list_transform(toks, t -> length(t))) AS max_len
            FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
      GROUP BY lang ORDER BY lang""")),

    // ARRAY JOIN / arrayJoin scalar → explode (the one
    // cardinality-changing scalar, §2.8); DuckDB UNNEST oracles it.
    QDef("scalar_array_join", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter($"doc_id" % 100 === 0)
        .select($"doc_id", explode(split($"text", " ")).as("token"))
        .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
        .orderBy($"doc_id", $"token")
    }, Some("""
      SELECT doc_id, token, count(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
            FROM documents WHERE doc_id % 100 = 0)
      GROUP BY doc_id, token ORDER BY doc_id, token""")),

    // Map family: construct, cardinality, sorted keys, point lookup.
    QDef("scalar_map", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .filter($"event_id" % 50 === 0)
        .withColumn("m", map(lit("t"), $"event_type", lit("u"), $"user_id".cast("string")))
        .select($"event_id",
          expr("cardinality(m)").as("m_size"),
          array_join(sort_array(map_keys($"m")), ",").as("keys_sorted"),
          element_at($"m", "t").as("m_t"),
          element_at($"m", "missing").as("m_missing"))
        .orderBy($"event_id")
    }, Some("""
      SELECT event_id, cardinality(m) AS m_size,
             array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted,
             map_extract(m, 't')[1] AS m_t,
             map_extract(m, 'missing')[1] AS m_missing
      FROM (SELECT event_id,
                   map(['t', 'u'], [event_type, CAST(user_id AS VARCHAR)]) AS m
            FROM events WHERE event_id % 50 = 0)
      ORDER BY event_id""")),

    // Tuple/struct family: build, field access, struct comparison.
    QDef("scalar_struct", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "supplier")
        .withColumn("st", struct($"s_nationkey".as("nk"), $"s_acctbal".as("bal")))
        .select($"s_suppkey", $"st.nk".as("nk"),
          round($"st.bal", 2).as("bal"),
          ($"st" === struct(lit(0).as("nk"), lit(0.0).as("bal"))).as("is_zero"))
        .orderBy($"s_suppkey")
    }, Some("""
      SELECT s_suppkey, st.nk AS nk, round(st.bal, 2) AS bal,
             st = {'nk': 0, 'bal': 0.0} AS is_zero
      FROM (SELECT s_suppkey,
                   {'nk': s_nationkey, 'bal': s_acctbal} AS st
            FROM supplier)
      ORDER BY s_suppkey""")),

    // Math family: abs/round/floor/ceil/sqrt/ln/log10/exp/sin/sign.
    // All libm values pass through round(,4) so cross-runtime ulp
    // differences vanish.
    QDef("scalar_math", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "supplier").select(
        $"s_suppkey",
        round(abs($"s_acctbal"), 4).as("abs_bal"),
        floor($"s_acctbal").as("fl"),
        ceil($"s_acctbal").as("ce"),
        round(sqrt(abs($"s_acctbal")), 4).as("sq"),
        round(log(abs($"s_acctbal") + 1.0), 4).as("ln1p"),
        round(log10(abs($"s_acctbal") + 1.0), 4).as("lg"),
        round(exp($"s_acctbal" / 10000.0), 4).as("e"),
        round(sin($"s_acctbal" / 1000.0), 4).as("sn"),
        signum($"s_acctbal").cast("int").as("sgn"),
        ($"s_suppkey" % 7).as("m7"))
        .orderBy($"s_suppkey")
    }, Some("""
      SELECT s_suppkey, round(abs(s_acctbal), 4) AS abs_bal,
             CAST(floor(s_acctbal) AS BIGINT) AS fl,
             CAST(ceil(s_acctbal) AS BIGINT) AS ce,
             round(sqrt(abs(s_acctbal)), 4) AS sq,
             round(ln(abs(s_acctbal) + 1.0), 4) AS ln1p,
             round(log10(abs(s_acctbal) + 1.0), 4) AS lg,
             round(exp(s_acctbal / 10000.0), 4) AS e,
             round(sin(s_acctbal / 1000.0), 4) AS sn,
             CAST(sign(s_acctbal) AS INTEGER) AS sgn,
             s_suppkey % 7 AS m7
      FROM supplier ORDER BY s_suppkey""")),

    // Conditional + cast family: CASE chain (multiIf), coalesce,
    // nullif, greatest/least, string↔int casts.
    QDef("scalar_conditional", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders").select(
        $"o_orderkey",
        when($"o_orderpriority" === "1-URGENT", 1)
          .when($"o_orderpriority" === "2-HIGH", 2)
          .otherwise(9).as("urgency"),
        coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("status"),
        greatest($"o_totalprice", lit(50000.0)).as("floor_price"),
        least($"o_custkey", $"o_orderkey").as("min_key"),
        substring($"o_orderpriority", 1, 1).cast("int").as("prio_num"),
        concat($"o_orderkey".cast("string"), lit("#")).as("key_str"))
        .filter($"o_orderkey" % 97 === 0)
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1
                  WHEN o_orderpriority = '2-HIGH' THEN 2
                  ELSE 9 END AS urgency,
             coalesce(nullif(o_orderstatus, 'O'), 'open') AS status,
             greatest(o_totalprice, 50000.0) AS floor_price,
             least(o_custkey, o_orderkey) AS min_key,
             CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
             CAST(o_orderkey AS VARCHAR) || '#' AS key_str
      FROM orders WHERE o_orderkey % 97 = 0 ORDER BY o_orderkey""")),

    // Hash + encoding family: md5 / sha2-256 / hex / base64 — both
    // engines agree byte-for-byte on UTF-8 input.
    QDef("scalar_hash_encode", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "nation").select(
        $"n_nationkey",
        md5($"n_name").as("h_md5"),
        sha2($"n_name", 256).as("h_sha256"),
        lower(hex($"n_name")).as("enc_hex"),
        base64($"n_name".cast("binary")).as("enc_b64"))
        .orderBy($"n_nationkey")
    }, Some("""
      SELECT n_nationkey, md5(n_name) AS h_md5,
             sha256(n_name) AS h_sha256,
             lower(hex(n_name)) AS enc_hex,
             base64(encode(n_name)) AS enc_b64
      FROM nation ORDER BY n_nationkey""")),

    // Bit family + IPv4NumToString: shifts, and/or/xor, bit_count,
    // dotted-quad rendering from an int (pure bit arithmetic — the
    // same text works in both dialects except xor, which DuckDB
    // spells xor()).
    QDef("scalar_bits_ip", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "orders")
        .filter($"o_orderkey" % 101 === 0)
        .withColumn("ip", ($"o_orderkey" * 2654435761L) % 4294967296L)
        .select($"o_orderkey",
          expr("shiftright(ip, 24) & 255").as("oct1"),
          expr("bit_count(ip)").as("bits"),
          expr("ip & 65535").as("low16"),
          expr("int(ip % 2) ^ int(o_orderkey % 2)").as("parity"),
          concat_ws(".",
            expr("shiftright(ip, 24) & 255"), expr("shiftright(ip, 16) & 255"),
            expr("shiftright(ip, 8) & 255"), expr("ip & 255")).as("dotted"))
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey,
             (ip >> 24) & 255 AS oct1,
             bit_count(ip) AS bits,
             ip & 65535 AS low16,
             xor(CAST(ip % 2 AS INTEGER), CAST(o_orderkey % 2 AS INTEGER)) AS parity,
             concat_ws('.', (ip >> 24) & 255, (ip >> 16) & 255,
                            (ip >> 8) & 255, ip & 255) AS dotted
      FROM (SELECT o_orderkey, (o_orderkey * 2654435761) % 4294967296 AS ip
            FROM orders WHERE o_orderkey % 101 = 0)
      ORDER BY o_orderkey""")),

    // URL family: parse_url in Spark; regexp-emulated in the oracle
    // (DuckDB ships no URL parser — same observable semantics).
    QDef("scalar_url", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "nation")
        // java.net.URI (behind parse_url) rejects '_' in hostnames, so
        // strip everything non-alphanumeric from the name.
        .withColumn("url", concat(lit("https://"), lower(regexp_replace($"n_name", "[^a-zA-Z0-9]", "")),
          lit(".example.com/r/"), $"n_regionkey", lit("?id="), $"n_nationkey"))
        .select($"n_nationkey",
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'id')").as("id_param"))
        .orderBy($"n_nationkey")
    }, Some("""
      SELECT n_nationkey,
             regexp_extract(url, 'https?://([^/]+)', 1) AS host,
             regexp_extract(url, 'https?://[^/]+(/[^?]*)', 1) AS path,
             regexp_extract(url, '[?&]id=([^&]*)', 1) AS id_param
      FROM (SELECT n_nationkey,
                   'https://' || lower(regexp_replace(n_name, '[^a-zA-Z0-9]', '', 'g')) ||
                   '.example.com/r/' || n_regionkey || '?id=' || n_nationkey AS url
            FROM nation)
      ORDER BY n_nationkey""")),

    // transform(x, [from], [to], default) — CH's dictionary-style
    // literal remap → element_at(map_literal) + coalesce.
    QDef("scalar_transform_dict", (s, dir) => {
      import s.implicits._
      val weights = map(
        lit("view"), lit(1), lit("click"), lit(3),
        lit("purchase"), lit(10), lit("signup"), lit(5))
      Tables(s, dir, "events")
        .withColumn("w", coalesce(element_at(weights, $"event_type"), lit(0)))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"w").as("weight_sum"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, count(*) AS n,
             CAST(sum(CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 3
                      WHEN 'purchase' THEN 10 WHEN 'signup' THEN 5
                      ELSE 0 END) AS BIGINT) AS weight_sum
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // CH's JSON/Dynamic/Variant column types (24.x headline feature)
    // → Spark 4's native VariantType (SURVEY §1.2): parse once into
    // a variant column, then typed variant_get extraction, missing-
    // path try_variant_get, and schema_of_variant introspection —
    // all inside whole-stage codegen, no string re-parse per access.
    // Oracle: DuckDB JSON extraction computes the same observables.
    QDef("scalar_variant_type", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "events")
        .selectExpr("parse_json(props) AS v")
        .selectExpr(
          "variant_get(v, '$.k', 'bigint') AS k",
          "CAST(try_variant_get(v, '$.missing', 'int') IS NULL AS INT) AS miss",
          "schema_of_variant(v) AS sch",
          "CAST(is_variant_null(parse_json('null')) AS INT) AS vnull")
        .groupBy(($"k" % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum($"k").as("sk"),
          sum($"miss").cast("long").as("n_missing"),
          max($"sch").as("sch"),
          max($"vnull").as("vn"))
        .orderBy($"bucket")
    }, Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS bucket,
             count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sk,
             CAST(count(*) AS BIGINT) AS n_missing,
             'OBJECT<k: BIGINT>' AS sch, 1 AS vn
      FROM events GROUP BY bucket ORDER BY bucket""")),

    // divideDecimal/multiplyDecimal with EXPLICIT result scales PAST
    // Spark's allowPrecisionLoss cap of 6 (the r14-ADVICE silent-loss
    // regression, fixed by the native DecimalExactArith expression).
    // DuckDB lacks decimal division (it degrades to DOUBLE), so the
    // oracle emulates round-half-up at scale 10 exactly on HUGEINT
    // unscaled values: round(A/B, s) = (2·A·10^s + B) // (2·B) for
    // positive A, B. Multiplication is natively exact in DuckDB.
    // l_discount > 0 keeps every output away from BigDecimal's
    // scientific-notation zone (0E-8 vs 0.00000000).
    QDef("scalar_decimal_exact", (s, dir) => {
      Graft.init(s, dir)
      Graft.sql(s, """
        SELECT l_orderkey AS ok, l_linenumber AS ln,
               toString(divideDecimal(toDecimal64(l_extendedprice, 2),
                                      toDecimal64(l_quantity, 2), 10)) AS dd,
               toString(multiplyDecimal(toDecimal64(l_extendedprice, 2),
                                        toDecimal64(l_discount, 2), 8)) AS md
        FROM lineitem WHERE l_discount > 0
        ORDER BY ok, ln LIMIT 25""")
    }, Some("""
      WITH t AS (
        SELECT l_orderkey AS ok, l_linenumber AS ln,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
               CAST(l_quantity AS DECIMAL(18,2)) AS q,
               CAST(l_discount AS DECIMAL(18,2)) AS d
        FROM lineitem WHERE l_discount > 0),
      u AS (
        SELECT ok, ln,
               (2 * CAST(p * 100 AS HUGEINT) * 10000000000 +
                CAST(q * 100 AS HUGEINT)) // (2 * CAST(q * 100 AS HUGEINT)) AS uu,
               CAST(CAST(p * d AS DECIMAL(38,8)) AS VARCHAR) AS md
        FROM t)
      SELECT ok, ln,
             concat(CAST(uu // 10000000000 AS VARCHAR), '.',
                    lpad(CAST(uu % 10000000000 AS VARCHAR), 10, '0')) AS dd,
             md
      FROM u ORDER BY ok, ln LIMIT 25"""))
  )
}
