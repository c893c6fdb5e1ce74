package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Thin bridge into `private[sql]` conversion helpers so the graft library
 * can wrap native Catalyst expressions as Columns (same technique as
 * public Spark extension libraries use for Dataset/Column factories).
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
