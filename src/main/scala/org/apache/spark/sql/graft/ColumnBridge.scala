package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst-Expression bridge for this library's native
  * kernels. Spark 4's unified `Column` hides the catalyst tree behind
  * `ColumnNode`, and the classic converters are `private[sql]` — the
  * supported seam for a library shipping its own `Expression`s (short
  * of a full `SparkSessionExtensions` injector) is this thin accessor
  * in the sql package. No behavior: two delegating calls.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
