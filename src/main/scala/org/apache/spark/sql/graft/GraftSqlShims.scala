package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.{DataFrame, ExperimentalMethods, SparkSession}

/** Minimal package-private-access shims (the standard extension-library
  * pattern: a tiny object inside `org.apache.spark.sql.*` so library
  * code can build a DataFrame from a custom LogicalPlan — Spark keeps
  * `Dataset.ofRows` private[sql] on purpose, and everything else in
  * this repo stays on the public API).
  */
object GraftSqlShims {

  /** DataFrame from a custom logical plan (analyzer runs eagerly). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan behind a DataFrame. */
  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Session hook for extra planner strategies / optimizer rules. */
  def experimental(spark: SparkSession): ExperimentalMethods =
    spark.asInstanceOf[classic.SparkSession].experimental
}
