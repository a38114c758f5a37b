package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Narrow bridge to two `private[sql]` constructors the SQLite dialect
  * layer needs: building a DataFrame from a rewritten parsed plan, and a
  * Column from a rewritten parsed expression. Spark exposes both shapes
  * publicly only through the SQL text path (`spark.sql`, `expr`), which
  * would bypass the dialect rewrite — this file exists solely so the
  * rewrite can sit between the parser and the analyzer, which is the
  * injection point Spark itself uses for dialect work. No other Spark
  * internals are touched.
  */
object SqlInternals {
  /** DataFrame from an (unresolved) logical plan — the analyzer runs as
    * part of the Dataset construction, exactly like `spark.sql`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column wrapping an (unresolved) expression — like `functions.expr`
    * but taking the expression tree instead of SQL text. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The expression tree under a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
