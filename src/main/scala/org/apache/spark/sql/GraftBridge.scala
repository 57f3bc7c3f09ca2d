package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the sql-package-private Column ↔ Expression
  * converters, so the graft library can expose native Catalyst
  * expressions (GraftExpressions.scala) as ordinary `Column`s. This is
  * the established pattern for third-party expression libraries on
  * Spark 4 (the converters are `private[sql]`); nothing else from the
  * private surface is touched. */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  def analyzed(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed
}

/** (BIGINT, BIGINT) input contract with standard implicit coercion, as a
  * mixin: `AbstractDataType` (the result type of `inputTypes`) is
  * `private[sql]`, so an expression living in the graft package cannot
  * override it directly — this trait names the private type from inside
  * the sql package and graft expressions just mix it in. INT/SMALLINT
  * arguments widen to LongType at analysis (matching upstream numeric
  * expressions); non-coercible inputs fail with the standard type-check
  * error. */
trait GraftLongLongInputs
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.types.AbstractDataType] =
    Seq(org.apache.spark.sql.types.LongType, org.apache.spark.sql.types.LongType)
}
