package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into `private[sql]` Column↔Expression conversion for
  * graft's custom Catalyst expressions (Spark 4 moved the classic Column
  * constructor behind `org.apache.spark.sql.classic.ExpressionUtils`). */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** EAGERLY converted Catalyst tree (`expression` returns a lazy
    * `ColumnNodeExpression` wrapper, opaque to pattern matching) — for
    * code that inspects a Column's structure, e.g. the streaming
    * compiler's ExprAgg→fold rewrite. */
  def catalystTree(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
