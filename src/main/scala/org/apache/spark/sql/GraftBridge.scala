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

  /** Column -> EAGERLY converted Catalyst expression tree. `expression`
    * defers behind a ColumnNodeExpression that only the Dataset boundary
    * unwraps; a FunctionRegistry builder's output never crosses that
    * boundary, so its tree must be real Catalyst nodes (unresolved ones are
    * fine — the analyzer keeps resolving builder output — but the lazy
    * wrapper is not, it reaches codegen unconverted). */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** Register a function on a LIVE session's registry (the builder-time
    * `SparkSessionExtensions.injectFunction` path only applies to sessions
    * instantiated after `withExtensions`/`spark.sql.extensions`; an already
    * running session registers here). */
  def registerFunction(
      spark: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState
      .functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
