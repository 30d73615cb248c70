package graft.queries

import graft.{Det, QDef, Tables}
import graft.ops.Text
import org.apache.spark.sql.functions._

/** Round-7 additions to the LLM-training-pipeline family: RAG-style
  * sliding-window document chunking and deterministic training-shard
  * assignment. Both are single-scan, shuffle-minimal shapes that hold
  * at 100 TB: chunking is a per-row generator (fanout bounded by
  * doc length / stride), sharding is one hash agg on a 64-key space.
  */
object Pipeline2Queries {

  /** Chunk window of 600 chars advancing by 400 → 200-char overlap. */
  private val ChunkSize = 600
  private val Stride    = 400

  val defs: Seq[QDef] = Seq(

    // Sliding-window chunking: every document becomes ceil(len/400)
    // overlapping 600-char chunks — the standard RAG/embedding prep
    // step. Pure per-row sequence+substr generation (codegen'd, no
    // shuffle, no UDF); chunk identity is pinned by an md5 prefix so
    // the oracle checks the exact chunk text, not just its size.
    QDef("pipe_chunk_sliding", (s, dir) => {
      import s.implicits._
      Tables(s, dir, "documents")
        .filter(length($"text") > 0)
        .select($"doc_id", $"text",
          posexplode(sequence(lit(0), length($"text") - 1, lit(Stride)))
            .as(Seq("chunk_idx", "start")))
        .select($"doc_id",
          $"chunk_idx".cast("long").as("chunk_idx"),
          $"start".cast("long").as("start"),
          length($"text".substr($"start" + 1, lit(ChunkSize))).cast("long").as("chunk_chars"),
          substring(md5($"text".substr($"start" + 1, lit(ChunkSize))), 1, 16).as("h"))
        .orderBy($"doc_id", $"chunk_idx")
    }, Some(s"""
      SELECT d.doc_id,
             CAST(s.start / $Stride AS BIGINT) AS chunk_idx,
             CAST(s.start AS BIGINT) AS start,
             CAST(length(substring(d.text, CAST(s.start AS INT) + 1, $ChunkSize)) AS BIGINT) AS chunk_chars,
             substring(md5(substring(d.text, CAST(s.start AS INT) + 1, $ChunkSize)), 1, 16) AS h
      FROM documents d,
           LATERAL (SELECT unnest(generate_series(0, length(d.text) - 1, $Stride)) AS start) s
      WHERE length(d.text) > 0
      ORDER BY doc_id, chunk_idx""")),

    // Deterministic shard assignment: the write-side of a training
    // dataset materialization. shard = mh60('shard', doc_id) mod 64 —
    // stable across runs/executor counts, uniform by construction —
    // with per-shard doc/char totals (the byte-budget planner's
    // input). One scan, one 64-key hash agg; repartitioning the real
    // write by `shard` gives exactly these files at any scale.
    QDef("pipe_shard_assign", (s, dir) => {
      import s.implicits._
      val N = 64
      Tables(s, dir, "documents")
        .select($"doc_id", length($"text").cast("long").as("chars"),
          (Text.mh60(lit("shard"), $"doc_id".cast("string")) % N).as("shard"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("docs"),
          sum($"chars").as("chars_total"),
          min($"doc_id").as("min_doc"),
          max($"doc_id").as("max_doc"))
        .orderBy($"shard")
    }, Some("""
      SELECT CAST('0x' || substring(md5('shard|' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS shard,
             count(*) AS docs,
             CAST(sum(length(text)) AS BIGINT) AS chars_total,
             min(doc_id) AS min_doc,
             max(doc_id) AS max_doc
      FROM documents
      GROUP BY shard ORDER BY shard""")),

    // BM25 retrieval scoring (k1=1.2, b=0.75, Lucene's +1 idf) for a
    // fixed 3-term query — the classic sparse-retrieval primitive a
    // RAG corpus needs next to the ANN path. All corpus statistics
    // (tf, df, dl, N, Σdl) are exact integers; each per-term
    // contribution is one fixed-shape double expression rounded to
    // 6dp into the decimal lattice, so the per-doc sum and the
    // ranking are order-independent at any executor count. Query
    // terms broadcast; everything else shuffles on doc_id/term.
    QDef("pipe_bm25", (s, dir) => {
      import s.implicits._
      // r15: ZERO corpus-wide exchanges. Term frequencies are finished
      // WITHIN the row by the token_counts generator (no explode +
      // groupBy shuffle), the broadcast terms semi-join shrinks the
      // corpus to the matched slice immediately (persisted — tiny),
      // and dl = size(tokens) is a map-side projection of the source
      // scan. df is a |terms|-key partial aggregate of the matched
      // slice. Only the matched slice and the docs-sized dl frame meet
      // a join — AQE broadcasts the tiny side while it fits and falls
      // back to a shuffled join gracefully when it doesn't.
      graft.functions.GraftFunctions.register(s)
      val docs = Tables(s, dir, "documents")
      val tf = docs.select($"doc_id", expr("token_counts(split(text, ' '))"))
      val terms = Seq("scan", "merge", "hash").toDF("tok")
      val matched = tf.join(broadcast(terms), "tok")
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val dl = docs.select($"doc_id",
        size(Text.tokens($"text")).cast("long").as("dl"))
      val stats = dl.agg(count(lit(1)).as("n"), sum($"dl").as("sumdl"))
      val dft = matched.groupBy($"tok").agg(count(lit(1)).as("df"))
      matched
        .join(dl, "doc_id")
        .join(broadcast(dft), "tok")
        .crossJoin(broadcast(stats))
        .withColumn("c",
          round(log(($"n" - $"df" + 0.5) / ($"df" + 0.5) + 1.0) * ($"tf" * 2.2) /
            ($"tf" + lit(1.2) * (lit(1.0) - 0.75 +
              lit(0.75) * $"dl" / ($"sumdl".cast("double") / $"n"))), 6)
            .cast("decimal(18,6)"))
        .groupBy($"doc_id").agg(sum($"c").as("sc"))
        .orderBy($"sc".desc, $"doc_id")
        .limit(10)
        .select($"doc_id", round($"sc".cast("double"), 4).as("score"))
    }, Some("""
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents),
      tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
      stats AS (SELECT count(*) AS n, CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
      terms(tok) AS (VALUES ('scan'), ('merge'), ('hash')),
      dft AS (SELECT tok, count(*) AS df FROM tf JOIN terms USING (tok)
              GROUP BY tok),
      contrib AS (
        SELECT tf.doc_id,
               CAST(round(ln((n - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
                 (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(sumdl AS DOUBLE) / n))),
                 6) AS DECIMAL(18,6)) AS c
        FROM tf JOIN terms USING (tok) JOIN dl USING (doc_id)
             JOIN dft USING (tok) CROSS JOIN stats),
      s AS (SELECT doc_id, sum(c) AS sc FROM contrib GROUP BY doc_id)
      SELECT doc_id, round(CAST(sc AS DOUBLE), 4) AS score
      FROM s ORDER BY sc DESC, doc_id LIMIT 10""")),

    // Per-dimension embedding standardization — the feature-scaling
    // pass before training/clustering: population mean and std per
    // dimension from exact decimal sums (order-independent), plus the
    // post-standardization invariant (each dimension's standardized
    // sum is 0 within rounding). One posexplode + one 64-key hash
    // agg — the fan-out is rows×dims, the same shape the corpus scan
    // already paid. The +0.0 after rounding canonicalizes IEEE -0.0
    // (DuckDB keeps it where Spark's BigDecimal rounding does not —
    // caught by the full sf0.1 ladder leg).
    QDef("pipe_embed_standardize", (s, dir) => {
      import s.implicits._
      val D = "decimal(28,8)"
      Tables(s, dir, "embeddings")
        .select($"vec_id", posexplode($"embedding").as(Seq("dim", "v")))
        .groupBy($"dim".cast("long").as("dim"))
        .agg(count(lit(1)).as("n"),
          sum($"v".cast(D)).cast("double").as("sx"),
          sum(($"v" * $"v").cast(D)).cast("double").as("sxx"))
        .select($"dim",
          $"n",
          (round($"sx" / $"n", 4) + lit(0.0)).as("mean"),
          round(sqrt(($"sxx" - $"sx" * $"sx" / $"n") / $"n"), 4).as("std"))
        .orderBy($"dim")
        .limit(16)
    }, Some("""
      WITH d AS (
        SELECT CAST(gs.i - 1 AS BIGINT) AS dim, embedding[CAST(gs.i AS INT)] AS v
        FROM embeddings,
             LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) gs),
      st AS (
        SELECT dim, count(*) AS n,
               CAST(sum(CAST(v AS DECIMAL(28,8))) AS DOUBLE) AS sx,
               CAST(sum(CAST(v * v AS DECIMAL(28,8))) AS DOUBLE) AS sxx
        FROM d GROUP BY dim)
      SELECT dim, n, round(sx / n, 4) + 0.0 AS mean,
             round(sqrt((sxx - sx * sx / n) / n), 4) AS std
      FROM st ORDER BY dim LIMIT 16""")),

    // Unicode-script detection — the multilingual-corpus router a
    // training pipeline runs before language-specific processing:
    // count codepoints per script class (explicit range classes so
    // Java regex and RE2 agree), classify by majority, report the
    // (declared-lang × detected-script) confusion counts. The fixture
    // text is ASCII, so the zh/fr stripes are first mapped through
    // deterministic `translate` tables into Han / accented-Latin
    // codepoints — giving the detector real non-ASCII content with a
    // known answer. Per-row regex + 10-group agg: one scan, scale-safe.
    QDef("pipe_script_detect", (s, dir) => {
      import s.implicits._
      val hanRange = "一-鿿"
      val cjk26 = (0x4e00 until 0x4e1a).map(_.toChar).mkString
      Tables(s, dir, "documents")
        .withColumn("t2", expr(
          s"""CASE WHEN lang = 'zh'
                THEN translate(text, 'abcdefghijklmnopqrstuvwxyz', '$cjk26')
              WHEN lang = 'fr'
                THEN translate(text, 'aeiou', 'àéîöû')
              ELSE text END"""))
        .withColumn("han",
          length(regexp_replace($"t2", s"[^$hanRange]", "")))
        .withColumn("lat",
          length(regexp_replace($"t2", "[^A-Za-zÀ-ÿ]", "")))
        .withColumn("script",
          when($"han" * 2 > ($"han" + $"lat"), "han")
            .when($"lat" * 2 > ($"han" + $"lat"), "latin")
            .otherwise("mixed"))
        .withColumn("conf", round(greatest($"han", $"lat").cast("double") /
          ($"han" + $"lat"), 4))
        .groupBy($"lang", $"script")
        .agg(count(lit(1)).as("n_docs"), Det.davg($"conf").as("avg_conf"))
        .orderBy($"lang", $"script")
    }, Some {
      val hanRange = "一-鿿"
      val cjk26 = (0x4e00 until 0x4e1a).map(_.toChar).mkString
      s"""
      WITH t AS (
        SELECT lang,
               CASE WHEN lang = 'zh'
                      THEN translate(text, 'abcdefghijklmnopqrstuvwxyz',
                                     '$cjk26')
                    WHEN lang = 'fr'
                      THEN translate(text, 'aeiou',
                                     'àéîöû')
                    ELSE text END AS t2
        FROM documents),
      c AS (
        SELECT lang,
               length(regexp_replace(t2, '[^$hanRange]', '', 'g')) AS han,
               length(regexp_replace(t2, '[^A-Za-zÀ-ÿ]', '', 'g')) AS lat
        FROM t)
      SELECT lang,
             CASE WHEN han * 2 > (han + lat) THEN 'han'
                  WHEN lat * 2 > (han + lat) THEN 'latin'
                  ELSE 'mixed' END AS script,
             count(*) AS n_docs,
             ${Det.sqlAvg(
               "round(CAST(greatest(han, lat) AS DOUBLE) / (han + lat), 4)")}
               AS avg_conf
      FROM c GROUP BY lang, script ORDER BY lang, script"""
    })
  )
}
