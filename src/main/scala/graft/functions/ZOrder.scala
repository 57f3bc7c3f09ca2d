package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{col, expr}

/** Z-order (Morton curve) layout key helpers around [[ZValue]].
  *
  * `interleave16` is the shared kernel: called by the expression's
  * interpreted eval AND by its generated code (Scala object methods get
  * static forwarders, so janino links the call directly). The magic-
  * number spread is the classic public-domain bit trick.
  */
object ZOrder {

  /** Spread the low 16 bits of v to even bit positions (0,2,4,…,30). */
  def spread16(v: Long): Long = {
    var s = v & 0xffffL
    s = (s | (s << 8)) & 0x00ff00ffL
    s = (s | (s << 4)) & 0x0f0f0f0fL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }

  /** Morton-interleave the low 16 bits of x (even positions) and y (odd
    * positions): a 32-bit z-value in a LONG. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)

  /** Native-expression column: `zvalue(x, y)`. Integral inputs only;
    * pass an explicit `.cast("long")` column to [[zvalue2]] to opt in
    * to a truncating conversion (raw DOUBLE/STRING fail analysis — see
    * GraftLongLongInputs). */
  def zvalue(xCol: String, yCol: String): Column =
    zvalue2(col(xCol), col(yCol))

  /** Column-typed spelling of [[zvalue]], for derived coordinates. */
  def zvalue2(x: Column, y: Column): Column =
    org.apache.spark.sql.GraftBridge.column(ZValue(
      org.apache.spark.sql.GraftBridge.expression(x),
      org.apache.spark.sql.GraftBridge.expression(y)))

  /** Portable shift-sum spelling of the same value (the shape the DuckDB
    * oracle uses); pinned bit-identical to [[zvalue]] in ZOrderSpec. */
  def zvalueSpec(xCol: String, yCol: String): Column =
    expr(s"""aggregate(sequence(0, 15), 0L, (acc, i) ->
            |  acc + shiftleft(shiftright($xCol, i) & 1, 2*i)
            |      + shiftleft(shiftright($yCol, i) & 1, 2*i + 1))""".stripMargin)
}
