package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: print the executed physical plan of declared queries.
  * Usage: runMain graft.Explain <sfDir> <queryName>... (no names = all).
  * Used to audit that plans stay scale-safe: pushed filters on scans,
  * broadcasts on dims, no BroadcastNestedLoopJoin, no global windows.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    // --out <dir> <suffix>: ALSO write each query's formatted plan to
    // <dir>/<query><suffix>.txt — the optimization rounds' before/after
    // plan evidence (plans/r19/).
    val (outDir, suffix, rest) = args.headOption match {
      case Some("--out") =>
        (Some(args(1)), args(2), args.drop(3))
      case _ => (None, "", args)
    }
    val sfDir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.001"
    val names = if (rest.length > 1) rest.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = Tuned(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"==== $n ====")
      val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
      println(qe.executedPlan)
      outDir.foreach { d =>
        val dir = java.nio.file.Paths.get(d)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$n$suffix.txt"),
          qe.explainString(org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted")).getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
