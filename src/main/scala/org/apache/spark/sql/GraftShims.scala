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

  /** Stable per-session identity (the classic session's UUID, scoped
    * `private[sql]`) — used to key session-scoped rule state such as
    * [[graft.plans.MvRewrite]]'s MV registry. */
  def sessionKey(spark: SparkSession): String = spark match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case s => s"id:${System.identityHashCode(s)}"
  }

  /** The planning thread's active session key, if any. */
  def activeSessionKey: Option[String] =
    org.apache.spark.sql.classic.SparkSession.getActiveSession.map(_.sessionUUID)
}
