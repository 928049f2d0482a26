package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's classic Column internals: Spark 4 made `new
  * Column(expr)` inaccessible outside `org.apache.spark.sql`, so extension
  * libraries expose custom Catalyst `Expression`s as `Column`s from a
  * sub-package of it — the same pattern used by public Spark extension
  * projects (cf. SNIPPETS.md [3], Qbeast's DatasetFactory).
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
