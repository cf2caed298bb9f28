package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the classic Column↔Expression converters, which are
  * `private[sql]` in their Scala signatures. Placing a forwarder in the
  * owning package is the established Spark-extension idiom for exposing
  * a custom Catalyst `Expression` as a `Column` without registering a
  * session-scoped function — keeps pure-Column APIs (e.g.
  * `graft.ext.TextStats`) working on any `SparkSession`.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
