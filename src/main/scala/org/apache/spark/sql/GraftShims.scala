package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made `Column` ColumnNode-backed and scoped the conversion
  * helpers `private[sql]`; this shim (placed in the `org.apache.spark.sql`
  * package for access) is the single sanctioned crossing point the rest of
  * the `graft` codebase uses to expose custom codegen'd Expressions as
  * Columns.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
