package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression ↔ Column bridge. Spark 4 moved the classic converters behind
  * `private[sql]`, so extension libraries host a one-file shim inside the
  * sql package tree — the established pattern for third-party Catalyst
  * expressions (no Spark internals are modified). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
