package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row character (code-point) Shannon entropy in nats — the classic
  * cheap quality signal for corpus curation (gibberish and binary-ish
  * spans score near the uniform bound, natural text sits well below it;
  * C4-style pipelines gate on it next to length and stopword ratios).
  *
  * Computed as `ln(n) − (Σ cᵢ·ln cᵢ)/n` from integer code-point counts:
  * one decode pass (same UTF-8 → code-point loop as
  * [[graft.functions.Winnow]], so an emoji is ONE symbol), one sort of
  * the per-row code points, one run-length pass summing in ascending
  * code-point order — a fixed summation order, so the double is
  * reproducible across partitionings and runs. No explode, no shuffle:
  * the whole signal is a map-side scalar inlined into whole-stage
  * codegen.
  */
object CharEntropy {

  def entropy(s: UTF8String): Double = {
    val bytes = s.getBytes
    // UTF-8 → code points (loop shape shared with Winnow.fingerprints),
    // VALIDATING: a malformed sequence — orphan continuation byte,
    // invalid lead, truncated tail, or a lead whose continuation slot
    // holds a non-continuation byte — counts as ONE U+FFFD symbol and
    // the scan resumes at the next byte, matching how validating
    // decoders count symbols (binary-ish strings are exactly what an
    // entropy gate targets, so their symbol count must not depend on
    // accidental bit patterns absorbed via `& 0x3f`)
    val units = new Array[Int](bytes.length)
    var nu = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      val len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else 0 // orphan continuation byte or invalid lead (0xf8-0xff)
      var cp = if (len == 1) b else b & (0x7f >> len)
      var valid = len > 0
      var j = 1
      while (valid && j < len) {
        if (i + j >= bytes.length || (bytes(i + j) & 0xc0) != 0x80) valid = false
        else { cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1 }
      }
      if (valid) { units(nu) = cp; i += len }
      else { units(nu) = 0xfffd; i += 1 }
      nu += 1
    }
    if (nu == 0) return 0.0
    val sorted = java.util.Arrays.copyOf(units, nu)
    java.util.Arrays.sort(sorted)
    // run lengths over the sorted code points, Σ c·ln(c) in ascending
    // code-point order (deterministic float summation)
    var acc = 0.0
    var run = 1
    i = 1
    while (i <= nu) {
      if (i < nu && sorted(i) == sorted(i - 1)) run += 1
      else {
        if (run > 1) acc += run * math.log(run.toDouble)
        run = 1
      }
      i += 1
    }
    math.log(nu.toDouble) - acc / nu
  }
}

/** Shannon entropy (nats) of a string column's code-point distribution:
  * a `double` scalar, one static-kernel call per row inside whole-stage
  * codegen. */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropy.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.entropy($c);")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}
