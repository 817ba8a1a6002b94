package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Package-placed shim exposing the session's FunctionRegistry
  * (private[sql]) so graft can register its Catalyst functions into
  * sessions it did not build (e.g. a harness-created SparkSession
  * without `.withExtensions`). The standard pattern for extension
  * libraries; nothing else from the private surface is touched.
  */
object GraftSqlShims {
  def functionRegistry(spark: SparkSession): FunctionRegistry =
    spark.sessionState.functionRegistry
}
