package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}

/** Bridge into the `private[sql]` Dataset constructor so graft can
  * build DataFrames over its own custom LogicalPlan nodes (the
  * standard technique Spark extension libraries use — the planner
  * surface for custom operators is package-private by design).
  */
object GraftDatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)
      .asInstanceOf[DataFrame]
}
