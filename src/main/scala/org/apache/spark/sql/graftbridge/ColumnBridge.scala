package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 made the classic `ExpressionUtils` (and the old
  * `new Column(expr)` constructor) `private[sql]`; the supported pattern
  * for extension libraries shipping custom expressions is a shim object
  * inside the `org.apache.spark.sql` namespace — the same access trick
  * every Spark-native connector/extension library uses. This is the ONLY
  * file in the repo that reaches across that boundary; everything else
  * goes through [[column]]/[[expression]].
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
