package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's
  * ColumnNode support). Lives under the `org.apache.spark.sql`
  * namespace solely to satisfy the access modifier — the standard
  * escape hatch for libraries that build `Column`s over custom
  * Catalyst expressions carrying non-expression constructor state
  * (graft's PpjoinPrefixExpr binds a per-call CountMinSketch, which
  * a name-based function registry cannot scope per call: a
  * session-global temp function closing over one call's sketch
  * cross-talks with concurrent calls on other inputs).
  */
object ColumnBridge {
  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Unwrap a Column to its Catalyst expression. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
