package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.{AHash, ArrayDotProduct, ArrayNorm2, MinHashSignature, PHash64, SimHash48, TopKValues, ZValue}

/** Algebraic rewrite over the native vector expressions: a self dot
  * product IS the squared norm, and [[ArrayNorm2]]'s generated loop does
  * half the array reads of [[ArrayDotProduct]] on the same input. A user
  * writing `graft_dot(emb, emb)` (e.g. a generated query) gets the
  * cheaper operator without knowing it exists — the textbook use of an
  * optimizer rule: canonicalize what users write into what should run. */
object DotToNorm extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayDotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
      ArrayNorm2(a)
  }
}

/** Session-extension wiring for the graft native expressions: SQL-callable
  * `graft_dot`/`graft_norm2` plus the [[DotToNorm]] optimizer rule. Users
  * opt in with `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) — the registration path a
  * library must ship for clusters where it does not own the session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  /** Arity gate for the SQL builders: a mis-called `graft_dot(a)` must
    * surface as the analyzer's standard wrong-number-of-arguments error,
    * not an IndexOutOfBoundsException escaping the builder. */
  private def checkArity(name: String, expected: Int, args: Seq[Expression]): Unit =
    if (args.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> args.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"),
        cause = None)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        checkArity("graft_dot", 2, args)
        ArrayDotProduct(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_norm2"),
      new ExpressionInfo(classOf[ArrayNorm2].getName, "graft_norm2"),
      (args: Seq[Expression]) => {
        checkArity("graft_norm2", 1, args)
        ArrayNorm2(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKValues].getName, "graft_topk"),
      (args: Seq[Expression]) => {
        checkArity("graft_topk", 2, args)
        def badK(): Nothing = throw new org.apache.spark.sql.AnalysisException(
          errorClass = "SECOND_FUNCTION_ARGUMENT_NOT_INTEGER",
          messageParameters = Map("functionName" -> "graft_topk"),
          cause = None)
        val k = args(1) match {
          case e if e.foldable && e.dataType ==
              org.apache.spark.sql.types.IntegerType =>
            // a foldable NULL would unbox to 0 and escape as an
            // IllegalArgumentException from the require — keep it an
            // analyzer error
            e.eval() match {
              case null => badK()
              case v => v.asInstanceOf[Int]
            }
          case _ => badK()
        }
        TopKValues(args(0), k)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "graft_zvalue"),
      (args: Seq[Expression]) => {
        checkArity("graft_zvalue", 2, args)
        ZValue(args(0), args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_char_entropy"),
      new ExpressionInfo(classOf[graft.functions.CharEntropyExpr].getName,
        "graft_char_entropy"),
      (args: Seq[Expression]) => {
        checkArity("graft_char_entropy", 1, args)
        graft.functions.CharEntropyExpr(args.head)
      }))
    // the per-row signature kernels, for pure-SQL sessions: integer
    // parameters must be foldable ints at ANALYSIS time (they size
    // arrays inside the kernels), enforced with the same analyzer-error
    // discipline as graft_topk's k. The error names the actual
    // parameter, so graft_minhash's THIRD argument (bandWidth) doesn't
    // get reported as "second argument".
    def litInt(fn: String, param: String, e: Expression): Int = {
      def bad(): Nothing = throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> s"`$fn`",
          "paramName" -> s"`$param`",
          "paramType" -> "\"INT\""),
        cause = None)
      e match {
        case x if x.foldable && x.dataType ==
            org.apache.spark.sql.types.IntegerType =>
          x.eval() match {
            case null => bad()
            case v => v.asInstanceOf[Int]
          }
        case _ => bad()
      }
    }
    ext.injectFunction((
      FunctionIdentifier("graft_phash"),
      new ExpressionInfo(classOf[PHash64].getName, "graft_phash"),
      (args: Seq[Expression]) => {
        checkArity("graft_phash", 1, args)
        PHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash48"),
      new ExpressionInfo(classOf[SimHash48].getName, "graft_simhash48"),
      (args: Seq[Expression]) => {
        checkArity("graft_simhash48", 1, args)
        SimHash48(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_ahash"),
      new ExpressionInfo(classOf[AHash].getName, "graft_ahash"),
      (args: Seq[Expression]) => {
        checkArity("graft_ahash", 2, args)
        AHash(args(0), litInt("graft_ahash", "bits", args(1)))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (args: Seq[Expression]) => {
        // graft_minhash(text, seeds) -> hex signature array;
        // graft_minhash(text, seeds, bandWidth) -> banded keys
        if (args.length < 2 || args.length > 3)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "`graft_minhash`",
              "expectedNum" -> "[2, 3]",
              "actualNum" -> args.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"),
            cause = None)
        val bw =
          if (args.length == 3) litInt("graft_minhash", "bandWidth", args(2)) else 0
        MinHashSignature(args(0), litInt("graft_minhash", "seeds", args(1)), bw)
      }))
    ext.injectOptimizerRule(_ => DotToNorm)
    ext.injectPlannerStrategy(_ => TopKStrategy)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    ext.injectPlannerStrategy(_ => IntervalJoinStrategy)
    // the ASOF LEFT JOIN / INTERVAL JOIN SQL surfaces: the delegating
    // parser rewrites the keyword and wraps the join; the resolution
    // rules split the ON condition by reference side once the analyzer
    // has resolved it (ASOF also lifts a `l.t - r.t <= N` conjunct into
    // the exec's tolerance)
    ext.injectParser((_, delegate) => new GraftSqlParser(delegate))
    ext.injectResolutionRule(_ => ResolveAsOfJoin)
    ext.injectResolutionRule(_ => ResolveIntervalJoin)
  }
}
