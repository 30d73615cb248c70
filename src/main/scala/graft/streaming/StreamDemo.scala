package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

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

  /** Raw schema of the events parquet when read as a stream (ts is
    * ns-int64 under nanosAsLong; normalize exactly like graft.Tables).
    */
  def rawEventSchema: StructType = new StructType()
    .add("event_id", LongType).add("ts", LongType)
    .add("user_id", LongType).add("event_type", "string")
    .add("value", "double").add("props", "string")

  /** File-stream replay of an events parquet directory (the Kafka-
    * engine stand-in: same unbounded-append contract).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(rawEventSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
}
