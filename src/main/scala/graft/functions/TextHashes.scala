package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row dedup-signature kernels: MinHash and SimHash signatures over a
  * document's distinct space-separated tokens, in one pass per row.
  *
  * These replace explode → 12-column (resp. 48-column) hash aggregates:
  * the md5 work is identical, but the per-doc reduction happens inside
  * the row instead of through a generate + hash-aggregate shuffle, so
  * the signature stage reads the documents scan and emits |docs| rows
  * with NO exchange. Digest math matches Spark's `md5()` exactly
  * (MessageDigest MD5, lowercase hex; min over hex strings ≡ unsigned
  * byte order of digests), so the DuckDB oracles are untouched and the
  * aggregate spellings are kept as test-pinned parity paths.
  */
object TextHashes {

  private val md5Pool = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Distinct `split(text, ' ')` tokens, empties dropped — exactly the
    * `array_distinct(split(...))` + `<> ''` base of the aggregate path. */
  private def distinctTokens(text: String): java.util.LinkedHashSet[String] = {
    val out = new java.util.LinkedHashSet[String]()
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) out.add(text.substring(start, i))
        start = i + 1
      }
      i += 1
    }
    out
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexChars = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val c = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      c(2 * i) = HexChars((d(i) >> 4) & 0xf)
      c(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(c))
  }

  /** `seeds` lowercase-hex minhashes: min over tokens of md5("j:token").
    * `bandWidth == 0` returns the raw signature (seeds hex strings);
    * `bandWidth == w` returns seeds/w band signatures, each w hex strings
    * joined by '|' (the LSH band key — emitting it here keeps the whole
    * signature+banding stage ONE kernel call per row; a separate
    * element_at-based banding projection re-references the kernel and the
    * optimizer may duplicate the evaluation). Null when the document has
    * no tokens: explode of null emits no rows, matching the aggregate
    * path which emits no group. */
  def minhashSignature(s: UTF8String, seeds: Int, bandWidth: Int): ArrayData = {
    val toks = distinctTokens(s.toString)
    if (toks.isEmpty) return null
    val md = md5Pool.get()
    val mins = new Array[Array[Byte]](seeds)
    val it = toks.iterator()
    while (it.hasNext) {
      val tok = it.next()
      var j = 0
      while (j < seeds) {
        val dig = md.digest((j.toString + ":" + tok).getBytes(StandardCharsets.UTF_8))
        if (mins(j) == null || unsignedLess(dig, mins(j))) mins(j) = dig
        j += 1
      }
    }
    if (bandWidth == 0) new GenericArrayData(mins.map(hex(_): Any))
    else {
      val nb = seeds / bandWidth
      val out = new Array[Any](nb)
      var b = 0
      while (b < nb) {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < bandWidth) {
          if (k > 0) sb.append('|')
          sb.append(hex(mins(b * bandWidth + k)).toString)
          k += 1
        }
        out(b) = UTF8String.fromString(sb.toString)
        b += 1
      }
      new GenericArrayData(out)
    }
  }

  /** [[PHash64]]'s kernel: sample [[PHashConsts.Samples]] code points at
    * positions `((len−1)·k)/(Samples−1)`, 2-D DCT with the shared
    * integer basis, threshold the 63 AC coefficients (row-major, DC
    * skipped) strictly above their median, pack ascending. */
  def phash(s: UTF8String): java.lang.Long = {
    import PHashConsts._
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    if (len == 0) return null
    val p = new Array[Long](Samples)
    var k = 0
    while (k < Samples) {
      p(k) = cps((((len - 1).toLong * k) / (Samples - 1)).toInt).toLong
      k += 1
    }
    // F(u,v) = sum_{x,y} C(u)(x) * C(v)(y) * p(x*8+y), exact BIGINT
    val f = new Array[Long](Samples)
    var u = 0
    while (u < Grid) {
      var v = 0
      while (v < Grid) {
        var acc = 0L
        var x = 0
        while (x < Grid) {
          var y = 0
          while (y < Grid) {
            acc += Dct(u)(x) * Dct(v)(y) * p(x * Grid + y)
            y += 1
          }
          x += 1
        }
        f(u * Grid + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = java.util.Arrays.copyOfRange(f, 1, Samples)
    val sorted = ac.clone()
    java.util.Arrays.sort(sorted)
    val median = sorted((Samples - 1) / 2) // index 31: the 32nd smallest of 63
    var hash = 0L
    k = 0
    while (k < Samples - 1) {
      if (ac(k) > median) hash |= 1L << k
      k += 1
    }
    hash
  }

  /** 48-bit SimHash: bit j (MSB-first) is the sign of the per-token
    * majority vote on hex-nibble bit j of md5(token). Null when the
    * document has no tokens. */
  /** Perceptual average-hash over `bits` evenly-spaced CODE-POINT samples
    * (mirrors the HOF spelling bit-for-bit: Spark `length`/`substring`/
    * `ascii` are all code-point-based, so the kernel walks code points,
    * not UTF-16 units): position_j = ((len-1)·j) / (bits-1), threshold
    * each sample against the sample mean via `v·bits >= Σv` (no
    * division), pack bit j ascending. Null for the empty string. */
  def ahash(s: UTF8String, bits: Int): java.lang.Long = {
    val cps = s.toString.codePoints().toArray
    val len = cps.length
    if (len == 0) return null
    val v = new Array[Long](bits)
    var sum = 0L
    var j = 0
    while (j < bits) {
      v(j) = cps((((len - 1).toLong * j) / (bits - 1)).toInt).toLong
      sum += v(j)
      j += 1
    }
    var hash = 0L
    j = 0
    while (j < bits) {
      if (v(j) * bits >= sum) hash |= 1L << j
      j += 1
    }
    java.lang.Long.valueOf(hash)
  }

  def simhash48(s: UTF8String): java.lang.Long = {
    val toks = distinctTokens(s.toString)
    if (toks.isEmpty) return null
    val md = md5Pool.get()
    val votes = new Array[Int](48)
    val it = toks.iterator()
    while (it.hasNext) {
      val tok = it.next()
      val dig = md.digest(tok.getBytes(StandardCharsets.UTF_8))
      var j = 0
      while (j < 48) {
        val p = j / 4
        val nibble =
          if ((p & 1) == 0) (dig(p / 2) >> 4) & 0xf
          else dig(p / 2) & 0xf
        votes(j) += (if (((nibble >> (j % 4)) & 1) == 1) 1 else -1)
        j += 1
      }
    }
    var sig = 0L
    var j = 0
    while (j < 48) {
      if (votes(j) >= 0) sig |= 1L << (47 - j)
      j += 1
    }
    java.lang.Long.valueOf(sig)
  }
}

/** MinHash signature column: `array<string>` of `seeds` hex minhashes
  * (bandWidth 0), or `seeds/bandWidth` '|'-joined band keys; null for
  * token-free documents. */
case class MinHashSignature(child: Expression, seeds: Int, bandWidth: Int = 0)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    TextHashes.minhashSignature(input.asInstanceOf[UTF8String], seeds, bandWidth)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TextHashes.minhashSignature($c, $seeds, $bandWidth);
       |if (${ev.value} == null) { ${ev.isNull} = true; }
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Perceptual average-hash column ([[TextHashes.ahash]]); null for the
  * empty string. `bits` must stay below 63 so the shifted bits and the
  * `v·bits` mean test cannot overflow, and at least 2 because sample
  * positions interpolate over `bits - 1` intervals (a 1-bit hash has no
  * second endpoint to interpolate toward). */
case class AHash(child: Expression, bits: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if bits >= 2 && bits <= 62 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"$prettyName bits must be in [2, 62], got $bits")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ahash"

  override def nullSafeEval(input: Any): Any = {
    val r = TextHashes.ahash(input.asInstanceOf[UTF8String], bits)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long ${ev.value}_r = graft.functions.TextHashes.ahash($c, $bits);
       |if (${ev.value}_r == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = ${ev.value}_r.longValue();
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): AHash =
    copy(child = newChild)
}

/** 48-bit SimHash column; null for token-free documents. */
/** pHash geometry: an 8×8 sample grid DCT'd with a fixed-point cosine
  * table; 63 AC coefficients thresholded against their median. */
object PHashConsts {
  val Grid = 8
  val Samples: Int = Grid * Grid
  val DctScale = 1024L

  /** DCT-II basis on the [[DctScale]] integer grid:
    * `C(u)(x) = round(1024 · cos((2x+1)uπ/16))`. Rounded ONCE here and
    * used verbatim by both the kernel and (interpolated as literals) the
    * DuckDB oracle — the two engines share the identical integer basis,
    * so the whole transform is exact BIGINT arithmetic with no libm call
    * on either side at query time. */
  val Dct: Array[Array[Long]] = Array.tabulate(Grid, Grid) { (u, x) =>
    math.round(DctScale * math.cos((2 * x + 1) * u * math.Pi / (2 * Grid)))
  }
}

/** DCT perceptual hash (pHash) over `PHashConsts.Samples` evenly-spaced
  * code-point samples arranged as an 8×8 grid: 2-D integer DCT with the
  * shared fixed-point basis, then bit k−1 set iff AC coefficient k
  * (row-major, skipping DC) exceeds the median of all 63 AC
  * coefficients. Unlike the average hash, pHash thresholds in the
  * FREQUENCY domain, so uniform brightness/contrast shifts (affine
  * sample changes) barely move it. Null for the empty string.
  * Magnitudes: |F| ≤ 64·1024²·0x10FFFF < 2^57 — exact in BIGINT. */
case class PHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_phash"

  override def nullSafeEval(input: Any): Any = {
    val r = TextHashes.phash(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long ${ev.value}_r = graft.functions.TextHashes.phash($c);
       |if (${ev.value}_r == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = ${ev.value}_r.longValue();
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): PHash64 =
    copy(child = newChild)
}

case class SimHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string input, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash48"

  override def nullSafeEval(input: Any): Any = {
    val r = TextHashes.simhash48(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |java.lang.Long ${ev.value}_r = graft.functions.TextHashes.simhash48($c);
       |if (${ev.value}_r == null) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = ${ev.value}_r.longValue();
       |}
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): SimHash48 =
    copy(child = newChild)
}
