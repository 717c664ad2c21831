package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst-Expression bridge. Spark 4 made these conversions
  * `private[sql]` (Column wraps a ColumnNode in sql-api), so the engine keeps
  * this one object inside an `org.apache.spark.sql` subpackage — the same
  * pattern Spark-ecosystem extension libraries use — and everything else in
  * the `graft` namespace on public APIs.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
