package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame => CDataFrame, Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` surface for building a DataFrame from
  * a custom LogicalPlan and injecting planner strategies at runtime —
  * the standard extension-library shim (same role as
  * `SparkSessionExtensions`, but composable per-session after startup via
  * `spark.experimental.extraStrategies`).
  */
object GraftSqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    CDataset.ofRows(spark.asInstanceOf[CSparkSession], plan)

  def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[CDataFrame].queryExecution.analyzed

  /** Idempotently add a planner strategy to the session. */
  def addStrategy(spark: SparkSession, strategy: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[CSparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ strategy
    }
  }

  /** Column ⇄ Expression bridge — lets custom codegen'd expressions
    * (ArrayCosine et al.) be applied to higher-order-function lambda
    * variables, where the SQL-string route (`expr("array_cosine(...)")`)
    * cannot reach.
    */
  def expression(c: Column): catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
