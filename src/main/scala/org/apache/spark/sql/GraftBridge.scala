package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, InSubquery, ListQuery, Not, ScalarSubquery}
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and Catalyst expressions.
  *
  * Spark 4.x hides `Column(expr)` behind the classic module's private[sql]
  * ExpressionUtils; this object lives in package org.apache.spark.sql to gain
  * that access — the one place we touch Spark internals. Used for (a) custom
  * Catalyst `Expression`s and (b) IN-subquery predicates, which the reference
  * engine (firepit) renders as `col IN (SELECT ...)` SQL text
  * (firepit/query.py:198-199,230-235) and we express as a native Catalyst
  * `InSubquery` so the optimizer rewrites it to a (semi/existence) join —
  * including under OR, where a manual left-semi join could not be composed.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  private def logicalPlan(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.logical

  /** `c IN (SELECT single-col FROM subquery)` as a Catalyst expression.
    * Catalyst's RewritePredicateSubquery turns this into a left-semi or
    * existence join at planning time — distributed, no driver collect.
    */
  def inSubquery(c: Column, subquery: DataFrame): Column =
    column(InSubquery(Seq(expression(c)), ListQuery(logicalPlan(subquery))))

  def notInSubquery(c: Column, subquery: DataFrame): Column =
    column(Not(InSubquery(Seq(expression(c)), ListQuery(logicalPlan(subquery)))))

  /** A single-row single-column DataFrame as a scalar-subquery EXPRESSION.
    * Spark plans it as its own job whose one result value is folded into the
    * consuming operator — the same mechanism InjectRuntimeFilter uses to feed
    * a whole-relation aggregate (e.g. a serialized Bloom filter) into a
    * map-side predicate without ever collecting through the driver API. */
  def scalarSubquery(df: DataFrame): Expression = ScalarSubquery(logicalPlan(df))
}
