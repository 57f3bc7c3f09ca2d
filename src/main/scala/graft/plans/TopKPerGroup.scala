package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator extension demo (the (c) tier of the custom-operator
  * preference order): top-k rows per group as a FIRST-CLASS operator —
  * logical node, planner strategy, physical exec — instead of the
  * `row_number().over(window)` + `filter(rn <= k)` composition, whose
  * physical plan SORTS every group's full row set before discarding all
  * but k. This exec keeps a bounded k-row heap per group: memory is
  * O(groups·k) per partition instead of sort buffers over everything,
  * and the only pass is the scan itself. At 100 TB that difference is a
  * spilled sort per partition vs a fixed-size heap.
  *
  * The production refinement (not implemented, same node): a map-side
  * partial pass emitting each partition's local top-k before the
  * shuffle, the aggregation-style two-phase layout.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: AttributeReference, // constructor field: exprId stable across copies
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = None

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)

  // all rows of a group must land in one partition; no sort required —
  // the heap does the per-group selection
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupSeq = groupExprs
    val orderSeq = order
    val kk = k
    child.execute().mapPartitions { rows =>
      val groupProj = UnsafeProjection.create(groupSeq, childOutput)
      val rowOrdering = GenerateOrdering.generate(orderSeq, childOutput)
      // per group: a max-heap under the sort order, so the worst kept row
      // is at the head and is evicted when a better row arrives
      val heaps = new java.util.HashMap[InternalRow, java.util.PriorityQueue[InternalRow]]()
      rows.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, rowOrdering.reversed())
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      val outProj = UnsafeProjection.create(childOutput :+ rnAttr, childOutput :+ rnAttr)
      val joined = new JoinedRow
      val rnRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      val it = heaps.entrySet().iterator()
      new Iterator[InternalRow] {
        private var buf: Array[InternalRow] = Array.empty
        private var i = 0
        private def refill(): Unit = {
          while (i >= buf.length && it.hasNext) {
            val heap = it.next().getValue
            val arr = new Array[InternalRow](heap.size())
            var j = arr.length - 1
            while (j >= 0) { arr(j) = heap.poll(); j -= 1 } // heap pops worst-first
            buf = arr; i = 0
          }
        }
        override def hasNext: Boolean = { refill(); i < buf.length }
        override def next(): InternalRow = {
          refill()
          val row = buf(i)
          rnRow.setInt(0, i + 1)
          i += 1
          outProj(joined(row, rnRow))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans the logical [[TopKPerGroup]] into its exec. Injected via
  * [[GraftExtensions]]; also applied directly by [[TopK.perGroup]]. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, rn, child) =>
      TopKPerGroupExec(g, o, k, rn, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** User-facing entry: `TopK.perGroup(df, groups, orders, k)` appends an
  * `rn` rank column and keeps each group's top k under the given order
  * (`(column, ascending?)` pairs). Registers [[TopKStrategy]] on the
  * session's `experimental` strategies (the runtime hook for sessions
  * built without [[GraftExtensions]], e.g. the driver-owned one). */
object TopK {
  import org.apache.spark.sql.{DataFrame, GraftBridge}
  import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}

  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderSpecs: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
    val child = GraftBridge.analyzed(df)
    val g = groupCols.map(c => GraftBridge.expression(df(c)))
    val o = orderSpecs.map { case (name, asc) =>
      SortOrder(GraftBridge.expression(df(name)),
        if (asc) Ascending else Descending)
    }
    val rn = AttributeReference("rn", IntegerType, nullable = false)()
    GraftBridge.ofRows(spark, TopKPerGroup(g, o, k, rn, child))
  }
}
