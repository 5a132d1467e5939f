package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column⇄Expression converters, so graft's
  * native Catalyst expressions (e.g. CosineSimilarity) can expose
  * Column-level APIs. This is the documented extension pattern for
  * libraries shipping custom expressions on Spark 4's Connect-split API. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
