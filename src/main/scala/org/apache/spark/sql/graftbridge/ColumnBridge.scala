package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4.x moved `Column` onto ColumnNode; building a `Column` from a
  * Catalyst `Expression` goes through `classic.ExpressionUtils`, which is
  * `private[sql]` — this tiny shim (in a subpackage of `org.apache.spark.sql`,
  * the standard extension-library pattern) re-exports just the two
  * converters the engine needs for its custom codegen expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Proper analysis-time arity error for injected SQL functions — the
    * same `WRONG_NUM_ARGS` condition built-in functions raise, instead of
    * an IndexOutOfBoundsException from `args(i)`. */
  def wrongNumArgs(function: String, expected: Int, actual: Int): Nothing =
    throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$function`",
        "expectedNum" -> expected.toString,
        "actualNum" -> actual.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"))
}
