package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-from-Expression bridge. Spark 4 moved the public `Column`
  * constructor behind `private[sql] classic.ExpressionUtils`; this
  * one-liner shim (the standard library-extension pattern) is the only
  * place the engine reaches into the sql namespace, so native
  * expressions (xxh3_64, array cosine) are usable from the DataFrame
  * API without a session-bound function registry.
  */
object GraftColumn {
  def of(e: Expression): Column = org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expr(c: Column): Expression = org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
