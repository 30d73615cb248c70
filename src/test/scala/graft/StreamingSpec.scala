package graft

import graft.streaming.StreamDemo
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.9 / §5.2.4: batch≡stream equivalence. The same transform
  * runs over the static events table and over a file-stream replay of
  * the same parquet; the final streamed state must equal the batch
  * answer (ClickHouse MV-pipeline-at-rest semantics).
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stageStreamDir(): String = {
    val dir = Files.createTempDirectory("graft_stream").toString
    Files.copy(
      Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(s"$dir/events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("tumbling daily counts: streamed result equals batch result") {
    val batch = StreamDemo.dailyCounts(
      Tables(spark, "/root/testdata/sf0.001", "events"))
    val expected = canon(batch)

    val stream = StreamDemo.dailyCounts(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.writeStream.format("memory")
      .queryName("daily_counts").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = canon(spark.table("daily_counts"))
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("CH tumble() SQL spelling runs on a STREAM and equals batch") {
    // WindowView text parity end-to-end: the CH-spelled tumble()
    // grouping drives a real Structured Streaming query (TimeWindow is
    // streaming-aggregable), not just batch SQL
    Graft.init(spark, "/root/testdata/sf0.001") // events view + dialect
    val batch = Graft.sql(spark, """
      SELECT tumbleStart(ts, INTERVAL 1 DAY) AS day, count() AS n
      FROM events GROUP BY tumble(ts, INTERVAL 1 DAY)""")
    val expected = canon(batch)

    StreamDemo.readEventStream(spark, stageStreamDir())
      .createOrReplaceTempView("events_stream")
    val stream = Graft.sql(spark, """
      SELECT tumbleStart(ts, INTERVAL 1 DAY) AS day, count() AS n
      FROM events_stream GROUP BY tumble(ts, INTERVAL 1 DAY)""")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory")
      .queryName("tumble_text").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = canon(spark.table("tumble_text"))
      assert(got.nonEmpty && got == expected)
    } finally q.stop()
  }

  test("hopping windows: streamed sliding counts equal batch") {
    val batch = StreamDemo.hopCounts(
      Tables(spark, "/root/testdata/sf0.001", "events"))
    val expected = canon(batch)

    val stream = StreamDemo.hopCounts(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.writeStream.format("memory")
      .queryName("hops").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(canon(spark.table("hops")) == expected)
    } finally q.stop()
  }

  test("stream-static enrichment: broadcast dim join + rollup equals batch") {
    import spark.implicits._
    val dim = Seq((0L, "seg_a"), (1L, "seg_b"), (2L, "seg_c"),
      (3L, "seg_d"), (4L, "seg_e")).toDF("seg", "seg_name")
    val batch = StreamDemo.enrichedCounts(
      Tables(spark, "/root/testdata/sf0.001", "events"), dim)
    val expected = canon(batch)

    val stream = StreamDemo.enrichedCounts(
      StreamDemo.readEventStream(spark, stageStreamDir()), dim)
    val q = stream.writeStream.format("memory")
      .queryName("enriched").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = canon(spark.table("enriched"))
      assert(got == expected)
      assert(got.size == 5)
    } finally q.stop()
  }

  test("stateful streaming funnel: final per-user depths equal batch windowFunnel") {
    import spark.implicits._
    val W = 7L * 86400L * 1000000L
    // batch truth from the declared funnel query
    val expected = SparkEntry.queries("funnel_window")(spark, "/root/testdata/sf0.001")
      .as[(Long, Int)].collect().toMap

    val stream = StreamDemo.streamingFunnel(
      StreamDemo.readEventStream(spark, stageStreamDir()), W)
    val q = stream.toDF("user_id", "depth").writeStream.format("memory")
      .queryName("funnel_state").outputMode("update").start()
    try {
      q.processAllAvailable()
      // update mode: keep the latest row per user
      val got = spark.table("funnel_state").as[(Long, Int)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("streaming sequenceMatch (pattern DSL): final per-user matches equal batch") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val pattern = "(?1).*(?t<=3600)(?2)" // view → click within 1h (5/15 users)
    // batch truth via the same parser-driven Aggregator
    val sm = udaf(new graft.ops.Aggregates.SequenceMatchPattern(pattern, 3))
    val step = when($"event_type" === "view", 1)
      .when($"event_type" === "click", 2)
      .when($"event_type" === "purchase", 3).otherwise(0)
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("step", step).filter($"step" > 0)
      .select($"user_id", unix_micros($"ts").as("tsUs"), $"step")
      .groupBy($"user_id").agg(sm($"tsUs", $"step").as("m"))
      .as[(Long, Boolean)].collect().toMap

    val stream = StreamDemo.streamingSequenceMatch(
      StreamDemo.readEventStream(spark, stageStreamDir()), pattern)
    val q = stream.toDF("user_id", "matched").writeStream.format("memory")
      .queryName("seq_state").outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("seq_state").as[(Long, Boolean)].collect()
        .groupBy(_._1).map { case (u, rows) => u -> rows.last._2 }
      assert(got == expected)
      assert(got.exists(_._2) && got.exists(!_._2), "want both outcomes present")
    } finally q.stop()
  }

  test("streaming uniq: KMV-sketch state, final estimates equal batch COUNT DISTINCT") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy($"event_type").agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap

    val stream = StreamDemo.streamingUniq(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.toDF("event_type", "uniq").writeStream.format("memory")
      .queryName("uniq_state").outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("uniq_state").as[(String, Long)].collect()
        .groupBy(_._1).map { case (t, rows) => t -> rows.last._2 }
      assert(got == expected) // below capacity: sketch estimates are exact
      assert(got.size == 5)
    } finally q.stop()
  }

  test("streaming topK: SpaceSaving state below capacity equals batch top-5") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy($"event_type", $"user_id".cast("string").as("uid"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.sortBy { case (_, u, c) => (-c, u) }.take(5)
          .map { case (_, u, c) => s"$u:$c" }.toSeq
      }

    val stream = StreamDemo.streamingTopK(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.toDF("event_type", "top").writeStream.format("memory")
      .queryName("topk_state").outputMode("update").start()
    try {
      q.processAllAvailable()
      val got = spark.table("topk_state").as[(String, Seq[String])].collect()
        .groupBy(_._1).map { case (t, rows) => t -> rows.last._2 }
      assert(got == expected) // cap 1024 >= distinct users: counters exact
      assert(got.size == 5)
    } finally q.stop()
  }

  test("streaming dedup: one row per fingerprint, fp set equals batch distinct") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val expected = Tables(spark, "/root/testdata/sf0.001", "events")
      .select(md5(concat_ws("|", $"user_id", $"event_type")).as("fp"))
      .distinct().as[String].collect().toSet

    val stream = StreamDemo.dedupByFingerprint(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.writeStream.format("memory")
      .queryName("dedup").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup").select("fp").as[String].collect()
      assert(got.length == got.distinct.length, "emitted duplicate fingerprints")
      assert(got.toSet == expected)
    } finally q.stop()
  }

  test("stream-stream interval join: streamed click attribution equals batch") {
    // Both join sides are STREAMS (a self-join of the replayed events
    // source) with watermarks + an event-time range in the ON clause —
    // the state-bounded stream-stream join CH cannot express. Inner
    // joins emit eagerly, so the append-mode output must equal the
    // batch join over the same parquet.
    val batchEvents = Tables(spark, "/root/testdata/sf0.001", "events")
    val expected = canon(StreamDemo.clickAttribution(batchEvents, batchEvents))

    val streamEvents = StreamDemo.readEventStream(spark, stageStreamDir())
    val q = StreamDemo.clickAttribution(streamEvents, streamEvents)
      .writeStream.format("memory")
      .queryName("click_attr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = canon(spark.table("click_attr"))
      assert(got == expected)
      assert(got.nonEmpty)
    } finally q.stop()
  }

  test("session windows: streamed sessionization equals batch") {
    val batch = StreamDemo.userSessions(
      Tables(spark, "/root/testdata/sf0.001", "events"))
    val expected = canon(batch)

    val stream = StreamDemo.userSessions(
      StreamDemo.readEventStream(spark, stageStreamDir()))
    val q = stream.writeStream.format("memory")
      .queryName("sessions").outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(canon(spark.table("sessions")) == expected)
    } finally q.stop()
  }

  test("streaming MinHash-LSH near-dup: final bucket state equals batch band groups") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // batch truth: the SAME signature/band expressions grouped at rest
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sig = graft.ops.Text.minhashSig(
      graft.ops.Text.shingles(graft.ops.Text.tokens(lower($"text")), 3), 12)
    val expected = docs
      .select($"doc_id".cast("long"),
        explode(graft.ops.Text.bandKeys(sig, 4, 3)).as("band"))
      .groupBy($"band")
      .agg(min($"doc_id").as("anchor"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect()
      .map { case (bd, a, n) => bd -> ((a, n)) }.toMap

    val dir = Files.createTempDirectory("graft_docs_stream").toString
    Files.copy(
      Paths.get("/root/testdata/sf0.001/documents.parquet"),
      Paths.get(s"$dir/documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docStream = spark.readStream
      .schema(docs.schema).parquet(dir)
    val q = StreamDemo.streamingNearDup(docStream)
      .toDF("band", "anchor", "n").writeStream.format("memory")
      .queryName("neardup_state").outputMode("update").start()
    try {
      q.processAllAvailable()
      // last emission per band is final (anchor monotone, n cumulative)
      val got = spark.table("neardup_state").as[(String, Long, Long)]
        .collect().zipWithIndex
        .groupBy(_._1._1)
        .map { case (bd, rows) => bd -> { val r = rows.maxBy(_._2)._1; (r._2, r._3) } }
      assert(got == expected)
      // sanity: the corpus has at least one near-dup candidate bucket
      assert(expected.values.exists(_._2 > 1))
    } finally q.stop()
  }

  test("checkpoint restart: watermarked agg stops mid-stream, resumes, equals batch") {
    // At real scale RECOVERY is the feature: a streaming job that can't
    // resume from its checkpoint replays history or loses state. This
    // spec time-splits the events table, processes the first half,
    // STOPS the query, then starts a NEW query on the SAME checkpoint
    // with the second half staged — the boundary day's window is
    // partially aggregated before the stop and only correct afterwards
    // if the state store actually came back.
    import org.apache.spark.sql.functions._
    val full = Tables(spark, "/root/testdata/sf0.001", "events")
    val expected = canon(StreamDemo.dailyCounts(full))

    val cutUs = full.selectExpr(
      "CAST(percentile_approx(unix_micros(ts), 0.5, 10000) AS BIGINT) AS c")
      .collect().head.getLong(0)
    val firstHalf = full.filter(unix_micros(col("ts")) <= cutUs)
    val secondHalf = full.filter(unix_micros(col("ts")) > cutUs)
    assert(firstHalf.count() > 0 && secondHalf.count() > 0)

    val dir = Files.createTempDirectory("graft_restart_src").toString
    val ckpt = Files.createTempDirectory("graft_restart_ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_restart_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    def runPhase(queryName: String): Unit = {
      val q = StreamDemo.dailyCounts(StreamDemo.readEventStream(spark, dir))
        .writeStream.format("memory").queryName(queryName)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    stage(firstHalf, "a.parquet")
    runPhase("restart_phase1")
    val partial = canon(spark.table("restart_phase1"))
    assert(partial.nonEmpty && partial != expected,
      "first half unexpectedly already equals the full answer")

    stage(secondHalf, "b.parquet")
    runPhase("restart_phase2")
    val resumed = canon(spark.table("restart_phase2"))
    assert(resumed == expected,
      "post-restart result diverged from batch — checkpoint state lost")
  }

  test("checkpoint restart under the RocksDB state store (the at-scale backend)") {
    // The default HDFS-backed store keeps every version of the state
    // in executor memory — at 100-TB stream scale the RocksDB provider
    // (disk-spilling, incremental-checkpointing) is the one that
    // actually runs. Same stop/resume shape as the tests around this
    // one, but with the provider swapped in for the query's lifetime:
    // state written by RocksDB before the stop must come back from the
    // RocksDB checkpoint after it.
    import org.apache.spark.sql.functions._
    val full = Tables(spark, "/root/testdata/sf0.001", "events")
    val expected = canon(StreamDemo.dailyCounts(full))
    val cutUs = full.selectExpr(
      "CAST(percentile_approx(unix_micros(ts), 0.5, 10000) AS BIGINT) AS c")
      .collect().head.getLong(0)

    val dir = Files.createTempDirectory("graft_rocksdb_src").toString
    val ckpt = Files.createTempDirectory("graft_rocksdb_ckpt").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_rocksdb_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def runPhase(queryName: String): Unit = {
        val q = StreamDemo.dailyCounts(StreamDemo.readEventStream(spark, dir))
          .writeStream.format("memory").queryName(queryName)
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      stage(full.filter(unix_micros(col("ts")) <= cutUs), "a.parquet")
      runPhase("rocksdb_p1")
      assert(canon(spark.table("rocksdb_p1")).nonEmpty)
      stage(full.filter(unix_micros(col("ts")) > cutUs), "b.parquet")
      runPhase("rocksdb_p2")
      assert(canon(spark.table("rocksdb_p2")) == expected,
        "RocksDB-backed state lost across the restart")
    } finally prev match {
      case Some(v) => spark.conf.set(provKey, v)
      case None => spark.conf.unset(provKey)
    }
  }

  test("checkpoint restart: CUSTOM GroupState (SpaceSaving topK) survives resume") {
    // The harder recovery case: not a built-in windowed agg but
    // mapGroupsWithState with a user-defined state type (the
    // SpaceSaving counter map). Half the events are processed, the
    // query STOPS, and a new query resumes from the checkpoint with
    // the other half staged — the final per-type top-5 only equals
    // the batch answer if every counter accumulated before the stop
    // came back out of the state store.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val full = Tables(spark, "/root/testdata/sf0.001", "events")
    val expected = full
      .groupBy($"event_type", $"user_id".cast("string").as("uid"))
      .agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (t, rows) =>
        t -> rows.sortBy { case (_, u, c) => (-c, u) }.take(5)
          .map { case (_, u, c) => s"$u:$c" }.toSeq
      }

    val dir = Files.createTempDirectory("graft_restart_topk_src").toString
    val ckpt = Files.createTempDirectory("graft_restart_topk_ckpt").toString
    val outDir = Files.createTempDirectory("graft_restart_topk_out").toString
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = Files.createTempDirectory("graft_restart_topk_stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      Files.move(part.toPath, Paths.get(s"$dir/$name"))
    }
    // the memory sink can't recover an update-mode query from a
    // checkpoint — foreachBatch CAN, and batchIds keep increasing
    // across the restart, so max(batch) per key is the final state
    def runPhase(): Unit = {
      val q = StreamDemo.streamingTopK(StreamDemo.readEventStream(spark, dir))
        .toDF("event_type", "top")
        .writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
          df.withColumn("batch", lit(id))
            .write.mode("append").parquet(outDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def lastPerType(): Map[String, Seq[String]] =
      spark.read.parquet(outDir).as[(String, Seq[String], Long)].collect()
        .groupBy(_._1).map { case (t, rows) => t -> rows.maxBy(_._3)._2 }

    // parity split: every event type gets rows in BOTH halves, so the
    // phase-2 trigger re-emits every group with merged counters
    stage(full.filter($"event_id" % 2 === 0), "a.parquet")
    runPhase()
    val partial = lastPerType()
    assert(partial.nonEmpty && partial != expected,
      "half the stream unexpectedly already equals the full answer")

    stage(full.filter($"event_id" % 2 === 1), "b.parquet")
    runPhase()
    val resumed = lastPerType()
    assert(resumed == expected,
      "post-restart topK diverged from batch — GroupState lost on resume")
  }
}
