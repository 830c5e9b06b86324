package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping a raw Catalyst `Expression` into a classic `Column`.
  * Spark 4's `Column` wraps `ColumnNode`s and the converter
  * (`org.apache.spark.sql.classic.ExpressionUtils`) is `private[sql]`, so
  * libraries that build typed Column APIs over native expressions (e.g.
  * `graft.functions.SimHash64Expr`) need this one-hop shim. Kept to the two
  * conversion calls — nothing else from the private surface. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
