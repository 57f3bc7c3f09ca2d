package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.functions.{col, expr, sqrt}

/** Vector math over `array<float>` embedding columns. The hot paths
  * ([[dot]]/[[norm2]]) are native Catalyst expressions with `doGenCode`
  * (GraftExpressions.scala) — a primitive loop per row, no lambda frames,
  * no boxing. The `aggregate`/`zip_with` spellings are kept as the
  * portable SPEC ([[dotSpec]]/[[norm2Spec]]): same sequential
  * double-accumulation order, so both forms are bit-identical (pinned in
  * VectorOpsSpec) and every DuckDB oracle is unchanged.
  */
object VectorOps {

  private def native(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftBridge.column(e)
  private def ex(name: String) = GraftBridge.expression(col(name))

  /** Dot product of two array<float> columns (by column name) — native
    * codegen'd expression. */
  def dot(a: String, b: String): Column = native(ArrayDotProduct(ex(a), ex(b)))

  /** Squared L2 norm — native codegen'd expression. */
  def norm2(a: String): Column = native(ArrayNorm2(ex(a)))

  /** Portable higher-order-function spec of [[dot]]. */
  def dotSpec(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")

  /** Portable higher-order-function spec of [[norm2]]. */
  def norm2Spec(a: String): Column = expr(
    s"aggregate($a, cast(0.0 as double), (acc, x) -> acc + cast(x as double) * cast(x as double))")

  /** Cosine similarity. */
  def cosine(a: String, b: String): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Signed-random-projection dot against a deterministic integer
    * hyperplane family: plane `j`, component `i` has coefficient
    * `((i*73 + i*i*31 + j*179 + j*j*97 + i*j*53) % 101) - 50` (the i*i/j*j/i*j terms break the linear structure that would make planes cyclic shifts of each other). Components are quantized to a fixed-point
    * integer grid first — `floor(x * 1024)` is exact (float→double widening
    * and ×2^10 are both lossless), so the whole projection is BIGINT
    * arithmetic: bit-identical in any engine and independent of summation
    * order. A float dot product here could flip a sign bit near 0 between
    * engines and silently change every downstream LSH candidate set. `j`
    * must be an integer column in scope. */
  def planeDot(emb: String, j: String): Column = expr(
    s"aggregate(sequence(0, size($emb) - 1), cast(0 as bigint), " +
      s"(acc, i) -> acc + cast(floor(cast(element_at($emb, i + 1) as double) * 1024) as bigint) " +
      s"* cast((i*73 + i*i*31 + $j*179 + $j*$j*97 + i*$j*53) % 101 - 50 as bigint))")
}
