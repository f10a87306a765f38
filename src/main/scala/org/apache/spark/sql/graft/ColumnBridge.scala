package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 hides these conversions behind
  * `private[sql] classic.ExpressionUtils`; a library shipping native
  * Catalyst expressions (graft.functions.CosineSimilarity) needs exactly
  * these two calls, so this object lives under `org.apache.spark.sql` to
  * re-export them — the conventional seam used by expression-extension
  * libraries, and the only Spark-internal surface this repo touches.
  */
object ColumnBridge {
  def column(e: Expression): Column     = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
