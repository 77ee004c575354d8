package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ⇄ Expression converters. Spark 4
  * wraps Column around ColumnNode and gates raw-Expression construction
  * behind `org.apache.spark.sql.classic.ExpressionUtils`; a custom
  * Catalyst expression (e.g. the StaticInvoke-backed hash kernels in
  * `graft.functions.HashFunctions`) needs exactly this hop and nothing
  * else from the internals. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
