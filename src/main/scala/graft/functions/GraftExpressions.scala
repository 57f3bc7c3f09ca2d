package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The portable spec for these lives in [[VectorOps]] as
  * `aggregate`/`zip_with` higher-order functions — correct, but each
  * element round-trips through a lambda frame. These expressions
  * generate a tight primitive loop over `ArrayData` instead (one
  * `getFloat` + multiply-add per element, no boxing, inlined into the
  * surrounding whole-stage-codegen stage), which is the preference order
  * the 100 TB posture demands: native expression > higher-order function
  * > UDF. Accumulation is sequential left-to-right in double, exactly
  * like the spec versions, so results are bit-identical to them (pinned
  * in VectorOpsSpec) and the DuckDB oracles are untouched.
  *
  * Contract: dense `array<float>` embeddings (no null elements) — the
  * embeddings table's shape. Interpreted eval mirrors the generated code.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float> inputs, got ${l.sql} and ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection LSH bucket id over `array<float>`: bit j set
  * when the exact-integer hyperplane projection `Σ_i floor(x_i·1024) ·
  * coef(i,j)` is non-negative, `coef(i,j) = ((i·73 + i²·31 + j·179 +
  * j²·97 + i·j·53) mod 101) − 50` — term-for-term the
  * [[VectorOps.planeDot]] spec, all planes in ONE pass per row. Replaces
  * an explode(planes) → interpreted-lambda aggregate → groupBy-sum
  * pipeline: no generate, no exchange, bit-identical buckets (the
  * arithmetic is exact BIGINT on both engines). */
case class LshBucket(child: Expression, planes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float> input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(a: Any): Any =
    LshBucket.bucket(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.LshBucket.bucket($x, $planes);")

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  def bucket(emb: ArrayData, planes: Int): Long = {
    val n = emb.numElements()
    var out = 0L
    var j = 0
    while (j < planes) {
      var acc = 0L
      var i = 0
      while (i < n) {
        val q = math.floor(emb.getFloat(i).toDouble * 1024.0).toLong
        val il = i.toLong
        val jl = j.toLong
        val coef = (il * 73 + il * il * 31 + jl * 179 + jl * jl * 97 + il * jl * 53) % 101 - 50
        acc += q * coef
        i += 1
      }
      if (acc >= 0) out |= 1L << j
      j += 1
    }
    out
  }
}

/** Squared L2 norm over `array<float>`, same design as [[ArrayDotProduct]]. */
case class ArrayNorm2(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects an array<float> input, got ${t.sql}")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_norm2"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = x.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $x.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = (double) $x.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ArrayNorm2 =
    copy(child = newChild)
}

/** 16-bit Morton (z-order) interleave: bit i of `left` lands at output
  * position 2i, bit i of `right` at 2i+1 — the space-filling-curve
  * layout key for multi-dimensional clustering. Sorting or
  * range-partitioning data by this key co-locates 2-D neighborhoods, so
  * a box predicate over BOTH dimensions touches O(perimeter) layout
  * tiles instead of full slabs of either dimension (the property behind
  * Delta/Iceberg Z-ORDER clustering; pinned in ZOrderSpec). Inputs are
  * truncated to their low 16 bits, so the value fits in 32 bits of a
  * LONG. The classic public-domain magic-number bit spread, inlined in
  * codegen; [[ZOrder.zvalueSpec]] keeps the portable shift-sum spelling
  * (bit-identical, and the shape the DuckDB oracle uses). */
case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.GraftLongLongInputs {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  // narrower integrals arrive un-cast (see GraftLongLongInputs):
  // interpreted path widens via Number.longValue, generated code via
  // Java's implicit primitive widening at the call site
  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(
      a.asInstanceOf[java.lang.Number].longValue,
      b.asInstanceOf[java.lang.Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZOrder.interleave16((long) $x, (long) $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}
