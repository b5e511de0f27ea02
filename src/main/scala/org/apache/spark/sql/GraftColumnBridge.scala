package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal public bridge to the `private[sql]` Column ↔ Expression
  * converters (`classic.ExpressionUtils`), so [[graft.plans.GraftExtensions]]
  * can register Column-built function trees in the SQL function
  * registry. Standard extension-library pattern: one object in the
  * Spark package namespace, no behavior of its own.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Eager conversion (ColumnNodeToExpressionConverter, not the lazy
    * ExpressionUtils wrapper): a function-registry builder must return
    * a real Catalyst tree — a deferred ColumnNodeExpression survives
    * analysis unconverted and dies at codegen. */
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
