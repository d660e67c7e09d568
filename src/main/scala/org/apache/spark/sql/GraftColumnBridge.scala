package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 made the Column ↔ Expression converters `private[sql]`
  * (classic.ExpressionUtils). This is the minimal sanctioned-package
  * bridge so the engine can expose native Catalyst expressions as
  * Columns without a session-bound function registry. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
