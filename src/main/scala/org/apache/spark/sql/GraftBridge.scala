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

/** INTEGRAL-ONLY binary input contract, as a mixin: `AbstractDataType`
  * (the result type of `inputTypes`) is `private[sql]`, so an expression
  * living in the graft package cannot override it directly — this trait
  * names the private type from inside the sql package and graft
  * expressions just mix it in.
  *
  * Deliberately NOT ImplicitCastInputTypes: implicit coercion would
  * admit DOUBLE→BIGINT and STRING→BIGINT — a silently TRUNCATING cast
  * that would turn raw un-quantized coordinates into a wrong layout key
  * instead of a loud type error. Instead, TINYINT/SMALLINT/INT/BIGINT
  * arguments are accepted as-is (the kernel widens via
  * Number.longValue / Java primitive widening) and every other type is
  * a clean analysis failure. An EXPLICIT `CAST(x AS BIGINT)` written by
  * the user is the documented opt-in: its dataType is BIGINT, so it
  * passes — consistently, whether single or chained, because the check
  * reads only each child's dataType. dataTypes are invariant under
  * optimizer rewrites, so `resolved` can never regress mid-optimization
  * (the round-6 Cast-unwrapping variant of this check was structural
  * and crashed CollapseProject when a project inlined an explicit cast;
  * pinned in ZOrderSpec "explicit cast-derived bigint"). */
trait GraftLongLongInputs
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  this: org.apache.spark.sql.catalyst.expressions.Expression =>

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
  import org.apache.spark.sql.types._

  override def inputTypes: Seq[AbstractDataType] = Seq(IntegralType, IntegralType)

  override def checkInputDataTypes(): TypeCheckResult = {
    val bad = children.map(_.dataType).filterNot {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (bad.nonEmpty) TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects integral (bigint-widenable) inputs, got " +
        bad.map(_.sql).mkString(", ") +
        "; write an explicit CAST(x AS BIGINT) to opt in to truncation")
    else TypeCheckResult.TypeCheckSuccess
  }
}
