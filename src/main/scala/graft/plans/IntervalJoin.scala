package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** INTERVAL (overlap) JOIN as a first-class operator — the third
  * whole-operator extension after [[TopKPerGroup]] and [[AsOfJoin]],
  * and the other canonical example of a join Spark's logical algebra
  * prices wrong: `l.key = r.key AND r.start <= l.end AND r.end >=
  * l.start` plans as a hash join on the key with the range residual as
  * a POST-FILTER over every same-key pair — per-key quadratic, the
  * classic genomics/sessions blowup (DuckDB ships a dedicated IEJoin
  * for exactly this shape; Spark has nothing).
  *
  * This exec is the textbook PLANE SWEEP on clustered+sorted children
  * (both sides sorted (keys, start) — the ordering their one shuffle
  * already pays for): per left interval, admit right intervals with
  * `r.start <= l.end` into an ACTIVE set (rights arrive start-ordered,
  * so admission pauses at the first non-qualifier and resumes when a
  * later, longer left re-raises the bar), evict actives with
  * `r.end < l.start` (dead for every later left too — left starts are
  * nondecreasing), and emit the survivors that also satisfy
  * `r.start <= l.end` (an active admitted by an earlier, longer left
  * can out-start a shorter current one). Cost O(|L| + |R| + output);
  * live memory = the PEAK CONCURRENT right-interval count per key —
  * the sweep-line bound, not the per-key row set.
  *
  * Semantics: INNER join on key equality + closed-interval overlap.
  * Null keys and null bounds never match (SQL comparison contract).
  * Emission order per left follows right start order, making the
  * output deterministic for a deterministic input — no dedup crutch
  * needed by the oracle.
  */
case class IntervalJoin(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

case class IntervalJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftStart: Expression,
    leftEnd: Expression,
    rightStart: Expression,
    rightEnd: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "interval join key types must match pairwise")
  require(Seq(leftEnd, rightStart, rightEnd).forall(_.dataType == leftStart.dataType),
    "interval join bound types must all match")

  override def output: Seq[Attribute] = left.output ++ right.output

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "peakActive" -> SQLMetrics.createMetric(sparkContext,
      "sum of per-partition peak active intervals"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftStart, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightStart, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftStart, Ascending)

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lS = leftStart
    val lE = leftEnd
    val rS = rightStart
    val rE = rightEnd
    val numOutputRows = longMetric("numOutputRows")
    val peakActive = longMetric("peakActive")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyAttrs = lKeys.zipWithIndex.map { case (e, i) =>
        AttributeReference(s"k$i", e.dataType, nullable = true)()
      }
      val keyOrd = GenerateOrdering.generate(
        keyAttrs.map(SortOrder(_, Ascending)), keyAttrs)
      val tAttr = AttributeReference("t", lS.dataType, nullable = true)() :: Nil
      val tOrd = GenerateOrdering.generate(tAttr.map(SortOrder(_, Ascending)), tAttr)
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lSProj = UnsafeProjection.create(lS :: Nil, lOutput)
      val lEProj = UnsafeProjection.create(lE :: Nil, lOutput)
      val rSProj = UnsafeProjection.create(rS :: Nil, rOutput)
      val rEProj = UnsafeProjection.create(rE :: Nil, rOutput)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, output)

      // active right interval: the copied row plus its copied bounds
      final class Active(val row: InternalRow, val s: UnsafeRow, val e: UnsafeRow)

      new Iterator[InternalRow] {
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var rKey: UnsafeRow = if (rRow != null) rKeyProj(rRow).copy() else null
        private val active = new java.util.ArrayList[Active]()
        private var curKey: UnsafeRow = null
        private var peak = 0L
        private var reported = false
        // pending emissions for the current left row
        private var curLeft: InternalRow = null
        private var emitIdx = 0
        private var curLEnd: UnsafeRow = null

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
          } else { rRow = null; rKey = null }
        }

        /** Position the sweep on the next left row with ≥1 overlap. */
        private def advanceLeft(): Unit = {
          while (curLeft == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            if (!lk.anyNull) { // null keys never match
              if (curKey == null || keyOrd.compare(lk, curKey) != 0) {
                active.clear()
                curKey = lk.copy()
                while (rRow != null && keyOrd.compare(rKey, curKey) < 0) advanceRight()
              }
              val ls = lSProj(l)
              val le = lEProj(l)
              if (!ls.isNullAt(0) && !le.isNullAt(0)) {
                val lsC = ls.copy(); val leC = le.copy()
                // evict rights dead for this and every later left FIRST
                // (lefts are start-ordered, so end < l.start never matches
                // again) — admission then never stacks live rows on top of
                // dead ones, keeping memory at the sweep-line bound
                var i = active.size() - 1
                while (i >= 0) {
                  if (tOrd.compare(active.get(i).e, lsC) < 0) active.remove(i)
                  i -= 1
                }
                // admit same-key rights with start <= l.end (start-ordered:
                // stop at the first non-qualifier, resume on a longer left);
                // null-bounded rights, and rights already dead for this
                // left (end < l.start), are consumed and dropped unbuffered
                var admitting = true
                while (admitting && rRow != null && keyOrd.compare(rKey, curKey) == 0) {
                  val rs = rSProj(rRow)
                  if (rs.isNullAt(0)) advanceRight() // sorts first; never matches
                  else if (tOrd.compare(rs, leC) <= 0) {
                    val re = rEProj(rRow)
                    if (!re.isNullAt(0) && tOrd.compare(re, lsC) >= 0) active.add(
                      new Active(rRow.copy(), rs.copy(), re.copy()))
                    advanceRight()
                  } else admitting = false
                }
                if (active.size() > peak) peak = active.size()
                if (!active.isEmpty) {
                  curLeft = l // valid until the next lIter.next()
                  curLEnd = leC
                  emitIdx = 0
                }
              }
            }
          }
          if (curLeft == null && !reported) { reported = true; peakActive += peak }
        }

        /** Skip actives that out-start the current (shorter) left; when a
          * left has none, move on (loop, not recursion — a long run of
          * non-emitting lefts must not grow the stack). */
        private def seekEmit(): Unit = {
          var settled = false
          while (!settled) {
            while (curLeft != null && emitIdx < active.size() &&
                tOrd.compare(active.get(emitIdx).s, curLEnd) > 0)
              emitIdx += 1
            if (curLeft != null && emitIdx >= active.size()) {
              curLeft = null
              advanceLeft()
            } else settled = true
          }
        }

        override def hasNext: Boolean = {
          if (curLeft == null) advanceLeft()
          seekEmit()
          curLeft != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val out = outProj(joined(curLeft, active.get(emitIdx).row))
          emitIdx += 1
          numOutputRows += 1
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[IntervalJoin]]. Registered at runtime by
  * [[Interval.join]] like the other custom tiers. */
object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(lk, rk, ls, le, rs, re, l, r) =>
      IntervalJoinExec(lk, rk, ls, le, rs, re, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** User-facing entry: `Interval.join(left, right, keys, ("ls","le"),
  * ("rs","re"))` — inner join on key equality + closed-interval
  * overlap. */
object Interval {
  import org.apache.spark.sql.{DataFrame, GraftBridge}

  /** `rightSuffix` is the same opt-in shared-name convention as
    * [[AsOf.join]]: colliding right columns are renamed `name + suffix`
    * internally; `keys`/`rightBounds` still name the originals. */
  def join(left: DataFrame, right: DataFrame,
      keys: Seq[(String, String)],
      leftBounds: (String, String), rightBounds: (String, String),
      rightSuffix: Option[String] = None): DataFrame = {
    val spark = left.sparkSession
    CustomJoins.ensureStrategy(spark, IntervalJoinStrategy)
    val (r, ren) = CustomJoins.applySuffix("interval join", left, right, rightSuffix)
    CustomJoins.requireDistinctNames("interval join", left, r)
    def rcol(name: String) = r(ren.getOrElse(name, name))
    GraftBridge.ofRows(spark, IntervalJoin(
      keys.map { case (l, _) => GraftBridge.expression(left(l)) },
      keys.map { case (_, k) => GraftBridge.expression(rcol(k)) },
      GraftBridge.expression(left(leftBounds._1)),
      GraftBridge.expression(left(leftBounds._2)),
      GraftBridge.expression(rcol(rightBounds._1)),
      GraftBridge.expression(rcol(rightBounds._2)),
      GraftBridge.analyzed(left), GraftBridge.analyzed(r)))
  }
}
