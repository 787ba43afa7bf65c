package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge to construct a DataFrame from a custom LogicalPlan —
  * `Dataset.ofRows` is `private[sql]`, so library operators that build
  * their own logical nodes (graft.plans.AsOfJoin) go through this
  * package-placed factory. Same pattern as public Spark-extension
  * projects (e.g. the DatasetFactory in Qbeast's open-source extension).
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for composing custom
    * binary nodes from user frames). */
  def analyzed(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
}
