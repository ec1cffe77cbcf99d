package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> catalyst Expression bridge. `ExpressionUtils` is
  * `private[sql]`, so this lives under org.apache.spark.sql — the standard
  * technique for Spark extension libraries that supply custom Expressions
  * (same access pattern the built-in connectors use). */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
