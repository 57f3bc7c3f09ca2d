package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Custom AGGREGATE function tier (next to the scalar-kernel tier in
  * [[GraftExpressions]]): one-pass top-k values per group as a
  * [[TypedImperativeAggregate]] — a bounded k-element min-heap that
  * Spark runs as a PARTIAL aggregate before the shuffle and MERGES on
  * the reduce side, exactly like a built-in agg. The shuffle therefore
  * carries one k-row buffer per (partition, group) instead of every row
  * of every group — the map-side-combine property that a
  * `sort + row_number` or `collect_list + slice` spelling of "top k
  * values" gives up entirely (collect_list ships ALL values to the
  * reducer; at 100 TB that is the difference between a bounded buffer
  * and an unbounded one).
  *
  * Buffer: a min-heap of doubles capped at k (the worst kept value at
  * the head); serialization is the raw doubles (8·size bytes), so a
  * partial buffer costs at most 8k bytes on the wire. Output: the kept
  * values sorted descending, as `array<double>`.
  */
case class TopKValues(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]] {

  require(k >= 1, s"graft_topk requires k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a double input, got ${other.sql}")
  }

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k)

  override def update(
      buf: java.util.PriorityQueue[java.lang.Double],
      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Double])
    buf
  }

  override def merge(
      buf: java.util.PriorityQueue[java.lang.Double],
      other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  private def add(buf: java.util.PriorityQueue[java.lang.Double], v: Double): Unit =
    if (buf.size() < k) buf.add(v)
    else if (v > buf.peek()) { buf.poll(); buf.add(v) }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    // NON-destructive: eval may run more than once against a live buffer
    // (e.g. the aggregate evaluated per-frame over a window), so read the
    // heap's elements without polling it empty
    val arr = new Array[Double](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // ascending → reverse in place for descending output
    var l = 0; var r = arr.length - 1
    while (l < r) { val t = arr(l); arr(l) = arr(r); arr(r) = t; l += 1; r -= 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.size() + 4)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKValues =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKValues =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKValues =
    copy(child = newChildren.head)
}
