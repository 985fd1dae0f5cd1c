package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Catalyst plumbing: Column ⇄ Expression
  * conversion for our custom expressions (Spark 4 removed the public
  * `new Column(expr)` constructor in favor of backend-agnostic ColumnNodes). */
package object graftshim {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
