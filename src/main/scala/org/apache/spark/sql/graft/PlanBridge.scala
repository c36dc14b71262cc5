package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into Spark's `private[sql]` plan constructors — the standard
  * extension-library pattern (same as [[ColumnBridge]], kept to exactly
  * these two calls). A custom whole-operator `LogicalPlan` (brief
  * preference (c)) has to enter the session through
  * `Dataset.ofRows`, and its children have to come OUT of existing
  * DataFrames as analyzed plans; both ends are `private[sql]` in
  * Spark 4's split API (`org.apache.spark.sql.classic`).
  */
object PlanBridge {

  /** The analyzed logical plan behind a DataFrame (attributes resolved,
    * exprIds assigned — the form custom binary nodes compose over). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
