package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Package-placed shim exposing two `private[sql]` entry points so
  * graft can behave like a first-party extension library:
  *
  *  - the session's FunctionRegistry, to register graft's Catalyst
  *    functions into sessions it did not build (e.g. a
  *    harness-created SparkSession without `.withExtensions`);
  *  - `Dataset.ofRows`, to wrap a graft logical node (e.g.
  *    graft.plans.TopKPerGroupNode) back into a DataFrame — the only
  *    way to hand a custom LogicalPlan to the planner.
  *
  * The standard pattern for extension libraries; nothing else from
  * the private surface is touched.
  */
object GraftSqlShims {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.sessionState.functionRegistry

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Expression ↔ Column bridges — needed to drive PUBLIC but
    * unregistered Catalyst expressions (e.g. BloomFilterAggregate /
    * BloomFilterMightContain, the runtime-filter machinery) from the
    * DataFrame API. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Column = classic.ExpressionUtils.column(e)

  def expression(c: Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
