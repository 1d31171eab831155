package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column-from-Expression
  * constructor. Lives in the `org.apache.spark.sql` package tree solely
  * for that access — it lets a model-carrying Catalyst expression (e.g.
  * [[graft.text.Bpe.BpeEncode]]) become a [[Column]] directly, instead
  * of routing through the SESSION-SHARED function registry, where two
  * concurrently-planned queries binding different models under one name
  * race (last register wins at analysis time). */
object ExprColumn {
  def apply(e: Expression): Column = ExpressionUtils.column(e)

  /** The inverse direction, for expressions that wrap other Columns. */
  def expr(c: Column): Expression = ExpressionUtils.expression(c)
}
