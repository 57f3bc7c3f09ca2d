package org.apache.spark.util

import java.util.Comparator

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.util.collection.ExternalSorter

/** Narrow door into core's `private[spark]` [[ExternalSorter]]: a
  * spill-capable sort of [[InternalRow]]s under an arbitrary comparator,
  * registered with the running task's memory manager — when the rows
  * don't fit the task's share of execution memory, runs spill to disk
  * and merge back, exactly like SortExec's sorter. The companion of
  * [[org.apache.spark.sql.GraftBridge]] (same bridge pattern, core side).
  *
  * Rows must already be safe to retain (i.e. copies): the sorter buffers
  * them across the consuming iterator's lifetime.
  */
object GraftSpill {
  def sorted(rows: Iterator[InternalRow],
      comp: Comparator[InternalRow]): Iterator[InternalRow] =
    sorted(rows, comp, _ => ())

  /** As above, with `spillReport` invoked exactly once (at iterator
    * exhaustion or task completion, whichever comes first) with the
    * sorter's disk bytes spilled — the hook callers feed an SQLMetric. */
  def sorted(rows: Iterator[InternalRow], comp: Comparator[InternalRow],
      spillReport: Long => Unit): Iterator[InternalRow] = {
    implicit val ord: Ordering[InternalRow] = Ordering.comparatorToOrdering(comp)
    val sorter = new ExternalSorter[InternalRow, Null, Null](
      TaskContext.get(), aggregator = None, partitioner = None, ordering = Some(ord))
    var reported = false
    def finish(): Unit = {
      if (!reported) { reported = true; spillReport(sorter.diskBytesSpilled) }
      sorter.stop()
    }
    // the consumer may abandon the iterator early (limit above the
    // operator); stop() at task completion releases spill files and
    // execution memory even then — the CompletionIterator only covers
    // full exhaustion (stop() is idempotent)
    Option(TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => finish()))
    sorter.insertAll(rows.map(r => (r, null)))
    CompletionIterator[Product2[InternalRow, Null], Iterator[Product2[InternalRow, Null]]](
      sorter.iterator, finish()).map(_._1)
  }
}
