package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Flat, bounded buffer for [[BottomKLongTuples]]: at most k tuples of
  * `arity` longs each, kept SORTED ascending (lexicographic) in one
  * primitive array — one small object per group, no boxing, which
  * matters because ObjectHashAggregate holds one live buffer per group
  * in its in-memory map. Insertion is O(k·arity) per accepted tuple
  * (k ≤ ~10 at every call site); a tuple ≥ the current max of a full
  * buffer is rejected in one comparison. */
private[functions] final class BottomKBuf(val arity: Int, val k: Int) {
  val data = new Array[Long](k * arity)
  var size = 0

  /** lexicographic compare of slot `s` against tuple `t` */
  private def cmpSlot(s: Int, t: Array[Long], tOff: Int): Int = {
    val base = s * arity
    var i = 0
    while (i < arity) {
      val c = java.lang.Long.compare(data(base + i), t(tOff + i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  def add(t: Array[Long], tOff: Int): Unit = {
    if (size == k && cmpSlot(size - 1, t, tOff) <= 0) return // >= max: reject
    // binary search for insertion point (first slot > t)
    var lo = 0; var hi = size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpSlot(mid, t, tOff) <= 0) lo = mid + 1 else hi = mid
    }
    val insert = lo
    val newSize = if (size < k) size + 1 else k
    // shift slots [insert, newSize-1) right by one (dropping the old max
    // when full), then write t at insert
    System.arraycopy(data, insert * arity, data, (insert + 1) * arity,
      (newSize - 1 - insert) * arity)
    System.arraycopy(t, tOff, data, insert * arity, arity)
    size = newSize
  }
}

/** One-pass BOUNDED bottom-k tuple collection per group — the aggregate
  * that makes the LSH bucket→pairs shape a single corpus pass
  * (r17 optimization round, guide §2.3/§2.4).
  *
  * The previous spelling of "emit all pairs from buckets of size
  * 2..MaxBucket" was: grouped COUNT over the banded stream, filter to
  * small buckets, join the banded stream back, then SELF-JOIN it —
  * three to four full evaluations of the scan + signature kernel and
  * two join exchanges, all to recover the members of buckets the count
  * pass had already seen. This aggregate collects the members (the k
  * lexicographically-smallest payload tuples, all-LONG fields) next to
  * the count in ONE aggregation pass; pair expansion is then a local
  * `transform`/`flatten` over ≤k-element arrays.
  *
  * Scale posture: the buffer is a flat k-capped sorted array, so a
  * pathological mega-bucket costs O(k·arity) memory and 8·arity·k bytes
  * on the wire per partial — the map-side-combine property a
  * `collect_list` spelling gives up entirely (it ships and buffers
  * EVERY member of every bucket; at 100 TB one hot bucket is an
  * executor OOM). Callers pair it with `count(1)` in the same agg and
  * filter on the COUNT, so bucket-size semantics stay exactly the
  * count-based prune's even when k < true bucket size.
  *
  * Output: `array<struct<c0:bigint, ...>>`, tuples sorted ascending
  * lexicographically — deterministic regardless of partitioning, merge
  * order, or input row order (duplicate tuples are kept as duplicates,
  * matching row-count semantics; null fields collect nothing, exactly
  * as a null key joined nothing in the join spelling). */
case class BottomKLongTuples(
    children: Seq[Expression],
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuf] {

  require(k >= 1, s"graft_bottomk requires k >= 1, got $k")
  require(children.nonEmpty, "graft_bottomk requires at least one field")

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(children.indices.map(i =>
      StructField(s"c$i", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_bottomk"

  override def checkInputDataTypes(): TypeCheckResult =
    children.find(_.dataType != LongType) match {
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects BIGINT fields only, got ${bad.dataType.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }

  override def createAggregationBuffer(): BottomKBuf =
    new BottomKBuf(children.length, k)

  override def update(buf: BottomKBuf, input: InternalRow): BottomKBuf = {
    val t = new Array[Long](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return buf // a null field: the row joins nothing, skip
      t(i) = v.asInstanceOf[Long]
      i += 1
    }
    buf.add(t, 0)
    buf
  }

  override def merge(buf: BottomKBuf, other: BottomKBuf): BottomKBuf = {
    var s = 0
    while (s < other.size) {
      buf.add(other.data, s * buf.arity)
      s += 1
    }
    buf
  }

  override def eval(buf: BottomKBuf): Any = {
    // NON-destructive (TopKValues precedent): eval may run more than
    // once against a live buffer — the slots are already sorted
    val arity = buf.arity
    val rows = new Array[Any](buf.size)
    var s = 0
    while (s < buf.size) {
      val fields = new Array[Any](arity)
      var i = 0
      while (i < arity) { fields(i) = buf.data(s * arity + i); i += 1 }
      rows(s) = new GenericInternalRow(fields)
      s += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: BottomKBuf): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 * buf.arity * buf.size + 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    out.writeInt(buf.arity)
    var i = 0
    while (i < buf.size * buf.arity) { out.writeLong(buf.data(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKBuf = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val arity = in.getInt
    val buf = new BottomKBuf(arity, k)
    // slots arrive sorted (serialize reads them in slot order), so add
    // appends in order without shifting
    var j = 0
    val t = new Array[Long](arity)
    while (j < n) {
      var i = 0
      while (i < arity) { t(i) = in.getLong; i += 1 }
      buf.add(t, 0)
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKLongTuples =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKLongTuples =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKLongTuples =
    copy(children = newChildren)
}
