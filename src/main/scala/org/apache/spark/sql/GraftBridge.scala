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

/** (BIGINT, BIGINT) input contract with INTEGRAL-ONLY implicit widening,
  * as a mixin: `AbstractDataType` (the result type of `inputTypes`) is
  * `private[sql]`, so an expression living in the graft package cannot
  * override it directly — this trait names the private type from inside
  * the sql package and graft expressions just mix it in.
  *
  * TINYINT/SMALLINT/INT arguments widen to LongType at analysis
  * (matching upstream numeric expressions). Plain ImplicitCastInputTypes
  * would additionally admit DOUBLE→BIGINT and STRING→BIGINT (even under
  * ANSI coercion) — a silently TRUNCATING cast that would turn raw
  * un-quantized coordinates into a wrong layout key instead of a loud
  * type error — so checkInputDataTypes re-asserts that each argument's
  * pre-coercion type was integral. */
trait GraftLongLongInputs
    extends org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
  this: org.apache.spark.sql.catalyst.expressions.Expression =>

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types._

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val sources = children.map {
      case c: Cast if c.dataType == LongType => c.child.dataType
      case e => e.dataType
    }
    val bad = sources.filterNot {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects integral (bigint-widenable) inputs, got " +
        bad.map(_.sql).mkString(", "))
    else super.checkInputDataTypes()
  }
}
