package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between [[Column]] and Catalyst [[Expression]] for custom
  * native expressions. Spark 4 removed the public `new Column(expr)`
  * constructor (Connect refactor); the classic-mode conversion lives in
  * `private[sql]` [[ExpressionUtils]], so this one-file shim sits
  * inside the `org.apache.spark.sql` package hierarchy — the standard
  * pattern used by Spark extension libraries.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
