package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge for graft's native expressions.
  *
  * Spark 4 made Column wrap a ColumnNode and gated the converters behind
  * `private[sql] classic.ExpressionUtils`. Building a Column directly from
  * a Catalyst Expression lets `graft.queries.Q.detHash` use the codegen
  * [[graft.plans.DetHash60Expression]] WITHOUT function-registry
  * resolution — so it works on any session, including spec sessions and
  * operators handed raw in-memory DataFrames that never pass through
  * `graft.Tables`'s registration chokepoint. Placing this one-file shim in
  * the `org.apache.spark.sql` package is the standard extension-library
  * pattern for exactly this purpose (same access level a Spark built-in
  * function implementation gets). */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
