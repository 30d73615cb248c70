package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of declared queries.
  * Usage: runMain graft.Explain <sfDir> <queryName>... (no names = all).
  * Used to audit that plans stay scale-safe: pushed filters on scans,
  * broadcasts on dims, no BroadcastNestedLoopJoin, no global windows.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan)
    }
    spark.stop()
  }
}
