package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.expressions.{ArrayCosine, ArrayDot, RollingHash}
import graft.plans.AsOfJoinStrategy

/** Session-extension entry point:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * registers the engine's native functions (`array_cosine`, `array_dot`,
  * `rolling_hash`) and the as-of-join planner strategy at session build
  * time — the deployment-config twin of the per-call `register(spark)` /
  * `GraftSqlShim.addStrategy` hooks the query builders use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("array_cosine"),
      new ExpressionInfo(classOf[ArrayCosine].getName, "array_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayCosine(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("array_dot"),
      new ExpressionInfo(classOf[ArrayDot].getName, "array_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        ArrayDot(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("block_mean_hash"),
      new ExpressionInfo(classOf[graft.expressions.BlockMeanHash].getName,
        "block_mean_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.BlockMeanHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("bottom_k_sample"),
      new ExpressionInfo(classOf[graft.expressions.BottomKSample].getName,
        "bottom_k_sample"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.expressions.BottomKSample(exprs(0), exprs(1), k = 10)
          .toAggregateExpression()))
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}
