package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, public Spark
  * source, columnNodeSupport.scala). Lets graft wrap a custom Catalyst
  * expression whose constructor carries a RUNTIME object (e.g. a
  * Broadcast handle) directly in a Column — the function-registry
  * route can't express that without mutating session-global state per
  * call, which races two concurrent queries on the same binding
  * (former km_assign_bc registration). Lives under org.apache.spark.sql
  * solely for the access scope; no Spark internals are modified. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
