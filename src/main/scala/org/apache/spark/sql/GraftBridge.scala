package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Package-private bridge (the standard pattern for libraries adding native
  * Catalyst expressions — cf. SNIPPETS.md [2]/[3]): Column ⇄ Expression
  * conversion lives behind `private[sql]` in Spark 4.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
