package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 hid the classic `Column(expr)`/`.expr` surface behind
  * `private[sql]` (`classic.ExpressionUtils`), so third-party libraries
  * that ship their own `Expression`s compile one forwarding object into
  * the `org.apache.spark.sql` package — the same pattern the public
  * Spark ecosystem uses (frameless, sedona, spark-nlp). Nothing here
  * but the two forwarders; all graft code lives in `graft.*`.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
