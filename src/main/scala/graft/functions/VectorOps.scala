package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{expr, sqrt}

/** Vector math over `array<float>` embedding columns, built from codegen'd
  * higher-order functions (`zip_with` + `aggregate`) — no UDFs, stays inside
  * whole-stage codegen. Elements are widened float→double before any
  * arithmetic; accumulation is sequential within the row, so results are
  * deterministic (independent of partitioning).
  */
object VectorOps {

  /** Dot product of two array<float|double> columns (by column name). */
  def dot(a: String, b: String): Column = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * cast(y as double)), " +
      "cast(0.0 as double), (acc, v) -> acc + v)")

  /** Squared L2 norm. */
  def norm2(a: String): Column = expr(
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
