package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between custom Catalyst [[Expression]]s and the public [[Column]]
  * API. Spark 4 made the Column↔Expression converters `private[sql]`
  * (`classic.ExpressionUtils`), so this one-file shim lives inside the
  * `org.apache.spark.sql` package to re-export exactly the two conversions
  * custom expressions need. No Spark internals are modified.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
