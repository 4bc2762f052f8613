package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` surface needed to expose custom Catalyst
  * expressions as `Column`s (the classic Column↔Expression converters
  * moved behind ColumnNode in Spark 4). Standard extension-library
  * shim — no Spark internals are modified. */
object GraftSqlShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
