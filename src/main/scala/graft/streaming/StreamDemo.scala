package graft.streaming

import graft.ops.Aggregates
import graft.ops.Aggregates.StepEvent
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import org.apache.spark.sql.types.{DataType, LongType, StructType, TimestampType}

/** SURVEY.md §2.9: ClickHouse's streaming surface (Kafka engine + MV
  * pipelines, WindowView tumble/hop) mapped to Structured Streaming.
  *
  * The transforms below take a plain DataFrame, so the SAME code runs
  * in batch and streaming — the batch≡stream equivalence test
  * (StreamingSpec) replays the events parquet as a file stream and
  * asserts the final streamed state equals the batch answer, which is
  * exactly the guarantee a ClickHouse materialized-view pipeline
  * gives at rest.
  */
object StreamDemo {

  /** MV-style rollup: tumbling 1-day windows × event type. The
    * watermark bounds state at one day of lateness — on an unbounded
    * stream, state size is O(active windows × types), independent of
    * input length.
    */
  def dailyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("day"), col("event_type"), col("n"))

  /** Hopping (sliding) windows: 2-day windows advancing daily — the
    * CH WindowView `hop(t, slide, size)` shape; each event lands in
    * size/slide windows.
    */
  def hopCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "2 days", "1 day"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("n"))

  /** Sessionization: gap-based session windows per user (Spark
    * exceeds ClickHouse here — CH has no session windows).
    */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("n_events"))

  /** Streaming exact deduplication — the streaming face of the
    * pipeline dedup operators: drop repeats of a content fingerprint,
    * with the watermark bounding the dedup state (CH users do this
    * with ReplacingMergeTree + FINAL; Structured Streaming does it at
    * ingest). `dropDuplicatesWithinWatermark` keeps state only for
    * one watermark delay — on an unbounded stream, state is O(events
    * per delay window), independent of history.
    */
  def dedupByFingerprint(events: DataFrame): DataFrame =
    events
      .withColumn("fp", md5(concat_ws("|", col("user_id"), col("event_type"))))
      .withWatermark("ts", "1 day")
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static dictionary enrichment — the CH `Kafka engine → MV
    * with dictGet(...)` shape: each streamed event joins a SMALL static
    * dimension (broadcast — no stream-side shuffle, no streaming
    * state) and rolls up per enriched key. At 100 TB/day of stream the
    * static side is still a broadcast; only the rollup keeps
    * (watermark-bounded) state.
    */
  def enrichedCounts(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .withColumn("seg", pmod(col("user_id"), lit(5)))
      .join(broadcast(dim), Seq("seg"))
      .withWatermark("ts", "1 day")
      .groupBy(col("seg_name"))
      .agg(count(lit(1)).as("n"))

  /** Stream-STREAM watermarked interval join — click attribution:
    * each `click` joins every preceding `view` by the same user within
    * one hour. Both sides carry watermarks and the ON clause carries
    * the event-time range constraint, so Spark bounds BOTH sides'
    * join state to interval + watermark — on an unbounded stream,
    * state is O(events per hour), independent of history. (ClickHouse
    * has no streaming join at all; its Kafka-engine users fall back to
    * batch joins over MergeTree.) Inner-join results emit eagerly, so
    * the streamed append output equals the batch join row set — the
    * transform takes plain DataFrames and runs identically in both
    * modes (StreamingSpec asserts equality).
    */
  def clickAttribution(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 hour")
    val c = clicks.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "1 hour")
    c.join(v,
      col("c_user") === col("v_user") &&
        col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("click_id"), col("c_user").as("user_id"),
        col("v_ts"), col("c_ts"))
  }

  /** Live windowFunnel over a stream via mapGroupsWithState — the
    * stateful-processing surface (SURVEY §2.9 last row; CH has no
    * user-facing analog). Per-user state = the (ts, step) buffer; the
    * DP from the batch Aggregator recomputes depth on every update,
    * so the streamed final state is definitionally the batch answer
    * over the same events (asserted in StreamingSpec). State is
    * bounded by matched events per user — same bound as the batch
    * buffer.
    */
  def streamingFunnel(events: DataFrame, windowUs: Long): Dataset[(Long, Int)] = {
    import events.sparkSession.implicits._
    val steps = events
      .withColumn("step",
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).otherwise(0))
      .filter(col("step") > 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"), col("step"))
      .as[(Long, Long, Int)]
    steps.groupByKey(_._1)
      .mapGroupsWithState[Seq[StepEvent], (Long, Int)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[Seq[StepEvent]]) =>
          val buf = state.getOption.getOrElse(Nil) ++
            it.map(t => StepEvent(t._2, t._3))
          state.update(buf)
          (uid, Aggregates.funnelDepth(buf, windowUs, 3))
      }
  }

  /** Live sequenceMatch over a stream, driven by a VERBATIM CH
    * pattern-DSL string ('(?1)(?t<=N)(?2)…' — round-6 parser): same
    * mapGroupsWithState shape as [[streamingFunnel]], recomputing the
    * shared chain DP per update so the streamed final state equals
    * the batch SequenceMatchPattern over the same events
    * (StreamingSpec). Condition mapping: view=1, click=2, purchase=3.
    */
  def streamingSequenceMatch(events: DataFrame, pattern: String)
      : Dataset[(Long, Boolean)] = {
    import events.sparkSession.implicits._
    val p = Aggregates.SeqPattern.parse(pattern)
    val steps = events
      .withColumn("step",
        when(col("event_type") === "view", 1)
          .when(col("event_type") === "click", 2)
          .when(col("event_type") === "purchase", 3).otherwise(0))
      .filter(col("step") > 0)
      .select(col("user_id"), unix_micros(col("ts")).as("tsUs"), col("step"))
      .as[(Long, Long, Int)]
    steps.groupByKey(_._1)
      .mapGroupsWithState[Seq[StepEvent], (Long, Boolean)](GroupStateTimeout.NoTimeout) {
        case (uid, it, state: GroupState[Seq[StepEvent]]) =>
          val buf = state.getOption.getOrElse(Nil) ++
            it.map(t => StepEvent(t._2, t._3))
          state.update(buf)
          (uid, Aggregates.patternMatches(buf, p))
      }
  }

  /** Live distinct-user counts per event type with BOUNDED state: the
    * per-key state IS a KMV theta sketch (graft.ops.Sketches — ≤ k
    * longs regardless of stream length), merged incrementally per
    * micro-batch. Below capacity the running estimate is exact
    * (batch-equal to COUNT(DISTINCT) — StreamingSpec); past it the
    * state stays O(k) where a naive distinct-set state grows without
    * bound — the streaming answer to the -State sketch family.
    */
  def streamingUniq(events: DataFrame, k: Int = 4096): Dataset[(String, Long)] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("user_id").cast("string").as("uid"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[Long], (String, Long)](GroupStateTimeout.NoTimeout) {
        case (eventType, it, state: GroupState[Seq[Long]]) =>
          val hashes = state.getOption.getOrElse(Vector.empty) ++
            it.map(t => graft.ops.Sketches.hash60("th", t._2))
          val sketch = graft.ops.Sketches.fromHashes(k, hashes)
          state.update(sketch.values.toVector)
          (eventType, math.round(sketch.estimate))
      }
  }

  /** Live topK per event type with BOUNDED state: the per-key state
    * is a SpaceSaving counter map hard-capped at `cap` entries (the
    * same guarantee as the batch topK sketch — when an unseen value
    * arrives at capacity it inherits the minimum counter +1, so true
    * heavy hitters can never be displaced by the tail). Below
    * capacity the counters are exact and the emitted top-k equals the
    * batch GROUP BY answer (StreamingSpec); past it state stays
    * O(cap) forever. Ties break on value ascending — deterministic
    * at any arrival order for the exact (below-cap) regime.
    */
  def streamingTopK(events: DataFrame, k: Int = 5,
      cap: Int = 1024): Dataset[(String, Seq[String])] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("user_id").cast("string").as("uid"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[Map[String, Long], (String, Seq[String])](
        GroupStateTimeout.NoTimeout) {
        case (eventType, it, state: GroupState[Map[String, Long]]) =>
          // Two-phase batch processing (r16 — the 10M-row STRESS rung
          // was eviction-bound): (1) pre-count the batch into a local
          // mutable map, O(rows); (2) WEIGHTED SpaceSaving merge of the
          // distinct uids into the state counters — the O(cap) min
          // scan now runs per evicting DISTINCT uid per batch, not per
          // row, and the per-row immutable-Map rebuild is gone. Below
          // capacity this is exactly per-row counting (the spec-pinned
          // contract); above capacity it is SpaceSaving's standard
          // weighted insert (evicted newcomer adopts min + its weight).
          val batch = new scala.collection.mutable.HashMap[String, Long]()
          it.foreach { case (_, uid) =>
            batch.update(uid, batch.getOrElse(uid, 0L) + 1L)
          }
          val m = scala.collection.mutable.HashMap[String, Long]() ++=
            state.getOption.getOrElse(Map.empty[String, Long])
          batch.foreach { case (uid, n) =>
            m.get(uid) match {
              case Some(c) => m.update(uid, c + n)
              case None if m.size < cap => m.update(uid, n)
              case None =>
                val (mk, mv) = m.minBy { case (kk, vv) => (vv, kk) }
                m.remove(mk)
                m.update(uid, mv + n)
            }
          }
          state.update(m.toMap)
          (eventType, m.toSeq.sortBy { case (u, c) => (-c, u) }.take(k)
            .map { case (u, c) => s"$u:$c" })
      }
  }

  /** Raw schema of the events parquet when read as a stream. The
    * fixture has shipped with ts as BOTH ns-int64 (under nanosAsLong)
    * and plain µs timestamp — the caller sniffs one file's footer via
    * a batch read and passes the ACTUAL on-disk ts type through, so
    * batch (graft.Tables) and stream always agree on the raw schema
    * whatever the fixture generation did.
    */
  /** Streaming MinHash-LSH near-duplicate detection — the pipeline
    * dedup operator (ops/Text, `pipe_minhash_lsh`) as an INCREMENTAL
    * stream: every document computes its minhash signature and `b`
    * LSH band keys stateless-ly (pure codegen'd expressions, no
    * shuffle); band keys group into keyed state holding ONLY
    * (anchor = min doc_id seen, count) per bucket — O(active buckets)
    * bytes total, independent of stream length, never the documents
    * themselves. A document sharing any bucket with an earlier
    * (smaller-anchor) document is a near-dup CANDIDATE — exactly the
    * batch LSH candidate rule, so final per-bucket state equals the
    * batch `GROUP BY band` min/count at rest (StreamingSpec).
    * On an unbounded corpus attach a watermark column and swap
    * NoTimeout for EventTimeTimeout to expire idle buckets (the batch
    * near-dup contract is within-corpus; the streaming contract is
    * within-retention).
    *
    * Emits (band, anchor, n) per update; `anchor` is monotone
    * non-increasing so the LAST emission per band is final.
    */
  def streamingNearDup(docs: DataFrame, k: Int = 12, b: Int = 4,
      r: Int = 3): Dataset[(String, Long, Long)] = {
    import docs.sparkSession.implicits._
    val sig = graft.ops.Text.minhashSig(
      graft.ops.Text.shingles(graft.ops.Text.tokens(lower(col("text"))), 3), k)
    docs
      .select(col("doc_id").cast("long"),
        explode(graft.ops.Text.bandKeys(sig, b, r)).as("band"))
      .as[(Long, String)]
      .groupByKey(_._2)
      .mapGroupsWithState[(Long, Long), (String, Long, Long)](
        GroupStateTimeout.NoTimeout) {
        case (band, it, state: GroupState[(Long, Long)]) =>
          val (anchor0, n0) = state.getOption.getOrElse((Long.MaxValue, 0L))
          var anchor = anchor0; var n = n0
          it.foreach { case (doc, _) =>
            if (doc < anchor) anchor = doc
            n += 1L
          }
          state.update((anchor, n))
          (band, anchor, n)
      }
  }

  def rawEventSchema(tsType: DataType): StructType = new StructType()
    .add("event_id", LongType)
    .add("ts", tsType)
    .add("user_id", LongType).add("event_type", "string")
    .add("value", "double").add("props", "string")

  /** File-stream replay of an events parquet directory (the Kafka-
    * engine stand-in: same unbounded-append contract). Normalizes ts
    * exactly like graft.Tables: ns-int64 → timestamp_micros(ns/1000),
    * tz-naive NTZ → TIMESTAMP (session TZ pinned UTC), TIMESTAMP
    * passes through — event-time ops need TimestampType.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val raw = spark.readStream.schema(rawEventSchema(tsType)).parquet(dir)
    tsType match {
      case LongType => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
