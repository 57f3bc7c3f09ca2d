package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row winnowing kernel (MOSS scheme) as a single pass over the raw
  * UTF8String bytes — the native replacement for the three chained
  * higher-order functions in TextAnalysis (`transform` evaluates its
  * lambda interpreted, per element; this is one JIT'd loop per row).
  *
  * Semantics are EXACTLY the registered column pipeline's:
  *  1. decode UTF-8 to code points — exactly what `split(text,'')` +
  *     `ascii(c)` yields (Spark regexes run per code point on
  *     UTF8String: an emoji stays ONE unit with its full value, probed
  *     and pinned in tests; max term 0x10FFFF·(mod−1)·k still fits Long);
  *  2. degree-(k−1) polynomial hash of every k-gram over those units,
  *     base/mod arithmetic identical term-for-term to the SQL spelling
  *     (each term ≤ 0xFFFF·(mod−1), k of them: no Long overflow);
  *  3. min of every w-window of hashes;
  *  4. order-preserving dedupe (= `array_distinct`).
  */
object Winnow {

  val HashMod = 1000000007L
  val HashBase = 257L

  def fingerprints(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    // UTF-8 → UTF-16 code units
    val units = new Array[Int](bytes.length)
    var nu = 0
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      var len =
        if (b < 0x80) 1
        else if ((b & 0xe0) == 0xc0) 2
        else if ((b & 0xf0) == 0xe0) 3
        else if ((b & 0xf8) == 0xf0) 4
        else 1
      var cp =
        if (len == 1) b
        else b & (0x7f >> len)
      var j = 1
      while (j < len) {
        if (i + j >= bytes.length) { len = j }
        else { cp = (cp << 6) | (bytes(i + j) & 0x3f); j += 1 }
      }
      i += len
      units(nu) = cp; nu += 1
    }
    val nh = nu - k + 1
    val nw = nh - w + 1
    if (nw <= 0) return new GenericArrayData(Array.empty[Long])
    // pows(j) = base^(k-1-j) mod M, identical to the SQL constant table
    val pows = new Array[Long](k)
    pows(k - 1) = 1L
    var p = k - 2
    while (p >= 0) { pows(p) = pows(p + 1) * HashBase % HashMod; p -= 1 }
    val hashes = new Array[Long](nh)
    var t = 0
    while (t < nh) {
      var acc = 0L
      var j = 0
      while (j < k) { acc += units(t + j) * pows(j); j += 1 }
      hashes(t) = acc % HashMod
      t += 1
    }
    // w-window mins, deduped in first-occurrence order
    val seen = new java.util.HashSet[Long]()
    val out = new Array[Long](nw)
    var no = 0
    t = 0
    while (t < nw) {
      var m = hashes(t)
      var j = 1
      while (j < w) { if (hashes(t + j) < m) m = hashes(t + j); j += 1 }
      if (seen.add(m)) { out(no) = m; no += 1 }
      t += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, no))
  }
}

/** Winnowing fingerprints of a string column: `array<bigint>` of deduped
  * window-min k-gram hashes. One static-kernel call per row, inlined into
  * whole-stage codegen (no lambda frames, no intermediate arrays of
  * 1-char strings). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.fingerprints($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}
