package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** ClickHouse executable (external-process) UDF analog (SURVEY §2.10):
  * stream serialized rows through an external command with
  * `RDD.pipe` — ONE PROCESS PER PARTITION, stdin/stdout line protocol,
  * exactly ClickHouse's `type: executable_pool` shape. Processes scale
  * out with executors (no driver funnel), and a partition is the unit
  * of retry, so a crashed process re-runs only its own split — the
  * behavior a 1000-executor job needs.
  *
  * The caller serializes columns to a delimited line and parses the
  * command's output lines back; keep the delimiter out of the data
  * (the declared query uses TAB over single-line text).
  */
object External {

  /** Serialize `df`'s columns with `sep`, pipe each partition through
    * `cmd`, return the raw output lines.
    */
  def pipeLines(df: DataFrame, sep: String, cmd: Seq[String]): Dataset[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    // coalesce each field: concat_ws SKIPS null values, which would
    // drop fields and shift the line protocol — a NULL must serialize
    // as an empty field, not a missing one.
    val fields = df.columns.map(c => coalesce(col(c).cast("string"), lit("")))
    val lines = df.select(concat_ws(sep, fields: _*).as("line")).as[String]
    spark.createDataset(lines.rdd.pipe(cmd))
  }
}
