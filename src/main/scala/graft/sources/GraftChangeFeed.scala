package graft.sources

import java.io.DataInputStream
import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** CHANGE DATA FEED over a [[GraftCatalog]] table — the CDC face every
  * table format grows once downstream consumers need increments instead
  * of snapshots (Delta's `readChangeFeed`, Iceberg's changelog scan).
  *
  * The feed is COMPUTED from the commit history, never stored: each
  * commit's change set is the MANIFEST DIFF between its version and its
  * predecessor, read at file granularity —
  *
  *  - files only in the NEW manifest are read as the commit's
  *    insert-side rows;
  *  - files only in the OLD manifest are read as its delete-side rows;
  *  - files in both moved no rows and are never opened.
  *
  * Because row-level operations are group-based COPY-ON-WRITE (a
  * rewritten file is removed and its replacement added), this diff is
  * EXACT under apply semantics — replaying (delete-side retractions,
  * then insert-side rows) per commit reconstructs every version — at
  * cost O(rewritten files), the same granularity the COW write paid.
  * Rows a rewrite carried over unchanged appear as a cancelling
  * delete+insert pair (the RETRACT form, Flink's changelog contract);
  * [[GraftChangeFeed.net]] reduces the feed to MINIMAL net changes
  * (Delta/Iceberg's form) with one aggregation.
  *
  * The commit-kind marker ([[GraftCatalog.KindFile]]) steers labeling:
  * an UPDATE commit's diff rows are `update_preimage`/`update_postimage`;
  * compaction (`OPTIMIZE`) is DATA-CHANGE-FALSE and emits NOTHING — an
  * admin rewriting bytes must not replay the table to consumers. A
  * pre-marker legacy commit serves the feed only when its diff is pure
  * append (anything else fails loudly rather than mislabel).
  *
  * Faces: BATCH over a seq range (`fromSeq` exclusive → `toSeq`
  * inclusive, defaulting to the full surviving history), and MICRO-BATCH
  * STREAMING (offsets = commit seqs, one version per trigger, admission
  * control + `Trigger.AvailableNow`, `startingSeq` option for backfill).
  * History a reader still needs must survive in the retention window —
  * a GC'd version fails loudly, the stream-source contract the table's
  * append-only stream face already pins.
  *
  * Usage: `spark.read.format("graft.sources.GraftChangeFeed")
  * .option("table", dir).option("fromSeq", n).load()`.
  */
class GraftChangeFeed extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftChangeFeed.feedSchema(
      GraftCatalog.tableSchema(GraftChangeFeed.tableDir(options)))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftChangeFeedTable(
      GraftChangeFeed.tableDir(new CaseInsensitiveStringMap(properties)))
}

object GraftChangeFeed {
  val ChangeTypeCol = "_change_type"
  val CommitSeqCol = "_commit_seq"
  val CommitTsCol = "_commit_ts"

  val Insert = "insert"
  val Delete = "delete"
  val UpdatePre = "update_preimage"
  val UpdatePost = "update_postimage"

  private[sources] def tableDir(options: CaseInsensitiveStringMap): Path = {
    val t = Option(options.get("table")).getOrElse(throw new IllegalArgumentException(
      "graft change feed requires option 'table' = the table directory"))
    val dir = Paths.get(t)
    if (!Files.exists(dir.resolve(GraftCatalog.SchemaFile)))
      throw new IllegalArgumentException(s"$t is not a graft table directory")
    dir
  }

  /** The feed's schema: the table's columns plus the three change
    * columns — nullable stays AS DECLARED for data columns (a preimage
    * is a real historical row). */
  def feedSchema(table: StructType): StructType =
    StructType(table.fields)
      .add(ChangeTypeCol, StringType, nullable = false)
      .add(CommitSeqCol, LongType, nullable = false)
      .add(CommitTsCol, TimestampType, nullable = true)

  private[graft] def currentSeq(dir: Path): Long =
    graft.similarity.IndexStore.pointer
      .resolve(dir, GraftCatalog.PointerName)
      .map(GraftCatalog.seqOf).getOrElse(0L)

  private def versionAt(dir: Path, seq: Long): Option[Path] =
    if (seq <= 0L) None
    else Some(GraftCatalog.findVersionBySeq(dir, seq.toString).getOrElse(
      throw new IllegalStateException(
        s"version $seq of $dir is gone (GC'd past the retention window); " +
          "a change-feed reader's lag must stay inside retention")))

  /** The tagged file splits of the commits in `(fromSeq, toSeq]` — the
    * whole feed computation. Driver cost: O(commits) manifest reads;
    * read cost: O(files the commits rewrote or added), never O(table). */
  private[sources] def changeSplits(dir: Path, schema: StructType,
      fromSeq: Long, toSeq: Long): Seq[GraftChangeSplit] = {
    require(fromSeq >= 0L && toSeq >= fromSeq,
      s"invalid change range ($fromSeq, $toSeq]")
    (fromSeq + 1L).to(toSeq).flatMap { s =>
      val vNew = versionAt(dir, s).get // s >= 1 here
      val before = versionAt(dir, s - 1L).map(GraftCatalog.readManifest)
        .getOrElse(Nil)
      val after = GraftCatalog.readManifest(vNew)
      val kind = GraftCatalog.kindOf(vNew)
      val tsMs = GraftCatalog.tsOf(vNew).getOrElse(0L)
      if (kind.contains(GraftCatalog.Kind.Compact)) Nil // data-change-false
      else {
        val beforeNames = before.map(_.file).toSet
        val afterNames = after.map(_.file).toSet
        val removed = before.filterNot(e => afterNames.contains(e.file))
        val added = after.filterNot(e => beforeNames.contains(e.file))
        // a deletion-vector delete keeps the file and fattens its mask:
        // the change set is exactly the NEWLY masked ordinals (read in
        // delta mode), cost O(one pass of that file)
        val beforeDv = before.map(e => e.file -> e.dv).toMap
        val dvGrown = after.filter(e =>
          beforeNames.contains(e.file) && beforeDv(e.file) != e.dv)
        val (delTag, insTag) = kind match {
          case Some(GraftCatalog.Kind.Update) => (UpdatePre, UpdatePost)
          case Some(_) => (Delete, Insert)
          case None if removed.isEmpty && dvGrown.isEmpty =>
            (Delete, Insert) // legacy, pure append
          case None => throw new IllegalStateException(
            s"commit $s of $dir predates the kind marker and is not pure " +
              "append; its diff cannot be labeled — read snapshots instead")
        }
        def data(f: String): String =
          dir.resolve(GraftCatalog.DataDir).resolve(f).toString
        def split(e: GraftCatalog.ManifestEntry, tag: String) =
          GraftChangeSplit(data(e.file), e.colsOr(schema.length), tag, s,
            tsMs, maskDv = e.dv.map(d => data(d.file)))
        removed.map(split(_, delTag)) ++ added.map(split(_, insTag)) ++
          dvGrown.map { e =>
            GraftChangeSplit(data(e.file), e.colsOr(schema.length), delTag,
              s, tsMs,
              deltaDv = Some((beforeDv(e.file).map(d => data(d.file)),
                data(e.dv.get.file))))
          }
      }
    }
  }

  /** MINIMAL NET CHANGES over `(fromSeq, toSeq]` — the retract feed
    * reduced per (row content, commit): carried-over rows' cancelling
    * pairs vanish, an update that left a row byte-identical vanishes,
    * and multiplicity is preserved exactly (a row inserted twice nets
    * two inserts). One hash aggregation — the only shuffle in the feed,
    * keyed by row content, so it scales with CHANGED rows, not table
    * size. Multiplicity restore materializes a per-group `sequence`
    * array, fine to ~1e6 copies of ONE identical row in ONE commit; a
    * corpus hotter than that should consume the grouped form (drop the
    * explode) and carry the count. */
  def net(spark: SparkSession, tableDir: String,
      fromSeq: Long, toSeq: Long): DataFrame = {
    val schema = GraftCatalog.tableSchema(Paths.get(tableDir))
    val raw = spark.read.format(classOf[GraftChangeFeed].getName)
      .option("table", tableDir)
      .option("fromSeq", fromSeq.toString).option("toSeq", toSeq.toString)
      .load()
    val dataCols: Seq[Column] = schema.fieldNames.toSeq.map(col)
    val side = when(col(ChangeTypeCol).isin(Insert, UpdatePost), 1L)
      .otherwise(-1L)
    val isUpd = when(col(ChangeTypeCol).startsWith("update"), 1).otherwise(0)
    raw
      .groupBy((dataCols :+ col(CommitSeqCol) :+ col(CommitTsCol)): _*)
      .agg(sum(side).as("_w"), max(isUpd).as("_u"))
      .where(col("_w") =!= 0L)
      .withColumn(ChangeTypeCol,
        when(col("_w") > 0L,
          when(col("_u") === 1, lit(UpdatePost)).otherwise(lit(Insert)))
          .otherwise(
            when(col("_u") === 1, lit(UpdatePre)).otherwise(lit(Delete))))
      .withColumn("_m", explode(sequence(lit(1L), abs(col("_w")))))
      .select((dataCols :+ col(ChangeTypeCol) :+ col(CommitSeqCol)
        :+ col(CommitTsCol)): _*)
  }
}

private class GraftChangeFeedTable(dir: Path) extends Table with SupportsRead {
  private val tableSchema = GraftCatalog.tableSchema(dir)
  // the default batch end is pinned when the TABLE resolves (one per
  // `load()`): every action over that DataFrame reads the same snapshot
  // range even if commits land between them — scans are rebuilt per
  // action, so the pin cannot live any later
  private val pinnedEnd: Long = GraftChangeFeed.currentSeq(dir)
  override def name(): String = s"graft_changes(${dir.getFileName})"
  override def schema(): StructType = GraftChangeFeed.feedSchema(tableSchema)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftChangeScanBuilder(dir, tableSchema,
      options.getLong("fromSeq", 0L),
      Option(options.get("toSeq")).map(_.toLong).getOrElse(pinnedEnd),
      options.getLong("startingSeq", -1L))
}

/** `toSeq` defaults to the table-resolution pin (see
  * [[GraftChangeFeedTable]]); `startingSeq` -1 = "current when the
  * stream initializes" (a new stream tails NEW changes; 0 backfills the
  * whole surviving history first). */
private class GraftChangeScanBuilder(dir: Path, tableSchema: StructType,
    fromSeq: Long, toSeq: Long, startingSeq: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private val full = GraftChangeFeed.feedSchema(tableSchema)
  private var required: StructType = full
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"graft_changes dir=$dir from=$fromSeq to=$toSeq"
    override def planInputPartitions(): Array[InputPartition] =
      GraftChangeFeed.changeSplits(dir, tableSchema, fromSeq, toSeq)
        .toArray[InputPartition]
    override def createReaderFactory(): PartitionReaderFactory =
      new GraftChangeReaderFactory(tableSchema, required.fieldNames)

    /** The STREAMING face: the table-as-stream offset protocol (one
      * committed version per trigger, admission-controlled, AvailableNow
      * latch), emitting each version's retract-form change rows instead
      * of requiring append-only history — the face that lets a consumer
      * FOLLOW a table mutated by UPDATE/MERGE/DELETE. */
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new MicroBatchStream with SupportsAdmissionControl
        with SupportsTriggerAvailableNow {
        @volatile private var latchedSeq: Long = -1L
        override def prepareForTriggerAvailableNow(): Unit =
          latchedSeq = GraftChangeFeed.currentSeq(dir)
        override def initialOffset(): Offset =
          GraftSeqOffset(
            if (startingSeq >= 0L) startingSeq
            else GraftChangeFeed.currentSeq(dir))
        override def latestOffset(): Offset =
          throw new UnsupportedOperationException(
            "admission-controlled source: engine must call latestOffset(start, limit)")
        override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
          val cur = GraftChangeFeed.currentSeq(dir)
          val cap = if (latchedSeq >= 0L) math.min(latchedSeq, cur) else cur
          GraftSeqOffset(
            math.min(start.asInstanceOf[GraftSeqOffset].seq + 1L, cap))
        }
        override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(1)
        override def reportLatestOffset(): Offset =
          GraftSeqOffset(GraftChangeFeed.currentSeq(dir))
        override def deserializeOffset(json: String): Offset =
          GraftSeqOffset(json.trim.toLong)
        override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
          GraftChangeFeed.changeSplits(dir, tableSchema,
            start.asInstanceOf[GraftSeqOffset].seq,
            end.asInstanceOf[GraftSeqOffset].seq)
            .toArray[InputPartition]
        override def createReaderFactory(): PartitionReaderFactory =
          new GraftChangeReaderFactory(tableSchema, required.fieldNames)
        override def commit(end: Offset): Unit = ()
        override def stop(): Unit = ()
      }
  }
}

/** One data file read AS a change set: every row tagged with the commit's
  * change type / seq / publish time. `cols` is the file's write-time
  * schema width (the evolution ledger — older, narrower files null-fill
  * the evolved tail exactly as the snapshot read path does). `maskDv`
  * masks ordinals that died in EARLIER commits (they are not part of
  * this change set); `deltaDv = (oldDv, newDv)` switches the reader to
  * DELTA mode — emit ONLY the ordinals newly masked by this commit. */
private case class GraftChangeSplit(path: String, cols: Int,
    changeType: String, seq: Long, tsMs: Long,
    maskDv: Option[String] = None,
    deltaDv: Option[(Option[String], String)] = None) extends InputPartition

private class GraftChangeReaderFactory(tableSchema: StructType,
    requiredNames: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[GraftChangeSplit]
    if (split.cols > tableSchema.length) throw new IllegalStateException(
      s"data file written with ${split.cols} columns but this reader's " +
        s"table snapshot has ${tableSchema.length}; re-resolve the feed " +
        "(stale schema across a concurrent ALTER TABLE)")
    val fileSchema = StructType(tableSchema.fields.take(split.cols))
    // ordinal >= 0: data column; negatives: the three change columns
    val TypeOrd = -1; val SeqOrd = -2; val TsOrd = -3
    val ordinals: Array[Int] = requiredNames.map { n =>
      if (n == GraftChangeFeed.ChangeTypeCol) TypeOrd
      else if (n == GraftChangeFeed.CommitSeqCol) SeqOrd
      else if (n == GraftChangeFeed.CommitTsCol) TsOrd
      else tableSchema.fieldIndex(n)
    }
    val tag = UTF8String.fromString(split.changeType)
    val tsMicros: Any = if (split.tsMs > 0L) split.tsMs * 1000L else null
    // emit(pos): delta mode emits exactly the newly masked ordinals
    // (new DV minus old DV); normal mode emits everything the mask
    // (rows dead BEFORE this commit) does not cover
    val emit: GraftDv.Cursor = split.deltaDv match {
      case Some((oldDv, newDv)) =>
        val old = oldDv.map(p => GraftDv.read(Paths.get(p)))
          .getOrElse(Array.emptyLongArray).toSet
        new GraftDv.Cursor(
          GraftDv.read(Paths.get(newDv)).filterNot(old.contains))
      case None => new GraftDv.Cursor(split.maskDv
        .map(p => GraftDv.read(Paths.get(p))).getOrElse(Array.emptyLongArray))
    }
    val deltaMode = split.deltaDv.isDefined
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(split.path))))
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      private var pos = -1L
      override def next(): Boolean = {
        var full = GraftRowCodec.read(in, fileSchema)
        pos += 1
        // delta mode: keep ordinals IN the delta; normal: keep those OUT
        while (full != null && emit.masked(pos) != deltaMode) {
          full = GraftRowCodec.read(in, fileSchema)
          pos += 1
        }
        if (full == null) false
        else {
          val out = new GenericInternalRow(ordinals.length)
          var i = 0
          while (i < ordinals.length) {
            ordinals(i) match {
              case TypeOrd => out.update(i, tag)
              case SeqOrd => out.update(i, split.seq)
              case TsOrd => out.update(i, tsMicros)
              case o if o < split.cols =>
                out.update(i, full.get(o, tableSchema.fields(o).dataType))
              case _ => () // evolved tail: null by definition
            }
            i += 1
          }
          current = out
          true
        }
      }
      override def get(): InternalRow = current
      override def close(): Unit = in.close()
    }
  }
}
