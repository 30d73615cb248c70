package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: splits a declared query's wall time into
  * front-door rewrite+analysis vs execution. Not part of the driver
  * contract; used to attribute sql_ch_parametric's bench cost.
  */
object ProfTmp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = if (args.length > 1) args(1) else "sql_ch_parametric"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm up codegen/classloading
    SparkEntry.queries("q1_flagship")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"PROF $name round $i build=${(t1 - t0) / 1e9}%.3f s exec=${(t2 - t1) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
