package graft.sources

import java.io.{BufferedOutputStream, DataInputStream, DataOutputStream, EOFException}
import java.nio.file.{Files, Path, Paths}
import java.util
import java.util.UUID

import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{Identifier, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.similarity.IndexStore

/** The WRITE face of the DSv2 connector tier (round 17, VERDICT r16 #1):
  * a catalog-registered table a SQL user can `CREATE TABLE` /
  * `INSERT INTO` / `INSERT OVERWRITE` / `SELECT` — the last missing face
  * of the source/sink surface (the read-only [[SyntheticDocsSource]]
  * proved scan + pushdown; every write previously exited through parquet
  * paths or foreachBatch).
  *
  * Each table is a MINI TABLE FORMAT with the essentials a 100 TB
  * deployment's formats (Delta/Iceberg) are built from:
  *
  *  - an immutable DATA-FILE POOL (`data/`): writer tasks stream rows
  *    into uniquely-named staged files that are INVISIBLE until a
  *    manifest references them — task retries and speculative duplicates
  *    just leave unreferenced orphans;
  *  - versioned MANIFESTS (`.v/<token>/manifest`, one line per data file
  *    with its row count): a commit writes a NEW manifest = (previous
  *    files unless truncating) ++ (this write's staged files) — append
  *    never rewrites data, truncate never deletes it (the old version
  *    still references it until GC'd);
  *  - an ATOMIC VERSION POINTER (`current`) through the SAME
  *    [[graft.similarity.SnapshotPointer]] seam the index store publishes
  *    through — readers resolve it ONCE at scan planning and read an
  *    immutable snapshot; a reader mid-scan across a concurrent commit
  *    keeps its files (version GC keeps current + previous + grace);
  *  - FAILURE ATOMICITY: `BatchWrite.commit` runs only when every task
  *    committed; `abort` unlinks the staged files it knows of and a
  *    grace-aged ORPHAN SWEEP at the next successful commit collects the
  *    rest — a failed or crashed write can never surface a row, because
  *    no manifest names its files (spec-pinned).
  *
  * Storage format: a row-oriented binary codec (null byte + fixed/
  * length-prefixed value per field — [[GraftRowCodec]]) over the scalar
  * types a catalog DDL declares. Column pruning is projection-level (a
  * row format must parse every field; the scan still reports and emits
  * only the required columns). At 100 TB the data pool would be parquet
  * on object storage and the manifest a transaction-log append; the
  * commit protocol — stage invisibly, publish by pointer swap, GC by
  * grace — is exactly what this connector exercises end to end.
  *
  * Identifiers are single-part (`catalog.table`); namespaces are
  * rejected loudly rather than silently flattened.
  *
  * Usage: `spark.sql.catalog.<name> = graft.sources.GraftCatalog`,
  * `spark.sql.catalog.<name>.root = <dir>`.
  */
class GraftCatalog extends TableCatalog {

  private var catalogName: String = _
  private var root: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Paths.get(options.getOrDefault("root", "/tmp/graft_catalog"))
    Files.createDirectories(root)
  }

  override def name(): String = catalogName

  private def requireFlat(ident: Identifier): Unit =
    if (ident.namespace().nonEmpty)
      throw new UnsupportedOperationException(
        s"graft catalog tables are single-part names; got ${ident.toString}")

  private def dirFor(ident: Identifier): Path = {
    requireFlat(ident)
    root.resolve(ident.name())
  }

  override def listTables(namespace: Array[String]): Array[Identifier] =
    if (namespace.nonEmpty) Array.empty
    else {
      val listing = Files.list(root)
      try listing.iterator().asScala
        .filter(p => Files.exists(p.resolve(GraftCatalog.SchemaFile)))
        .map(p => Identifier.of(Array.empty, p.getFileName.toString))
        .toArray
      finally listing.close()
    }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    val schemaFile = dir.resolve(GraftCatalog.SchemaFile)
    if (!Files.exists(schemaFile)) throw new NoSuchTableException(ident)
    val schema = DataType.fromJson(Files.readString(schemaFile))
      .asInstanceOf[StructType]
    new GraftTable(ident.name(), dir.toString, schema)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    requireFlat(ident)
    if (partitions.nonEmpty) throw new UnsupportedOperationException(
      "graft catalog tables are unpartitioned")
    val bad = schema.fields.filterNot(f => GraftRowCodec.supported(f.dataType))
    if (bad.nonEmpty) throw new UnsupportedOperationException(
      s"unsupported column types: ${bad.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", ")}")
    val dir = dirFor(ident)
    // creation serializes on the same per-table lock commits use, so two
    // racing CREATEs collapse to one winner + one loud AlreadyExists
    IndexStore.withArtifactLock(GraftCatalog.lockName(dir)) {
      if (Files.exists(dir.resolve(GraftCatalog.SchemaFile)))
        throw new TableAlreadyExistsException(ident)
      Files.createDirectories(dir.resolve(GraftCatalog.DataDir))
      Files.createDirectories(dir.resolve(GraftCatalog.VersionsDir))
      // schema lands via temp + atomic move: a reader can never observe
      // a half-written schema file
      val tmp = dir.resolve(s".${GraftCatalog.SchemaFile}.${UUID.randomUUID().toString.take(8)}")
      Files.writeString(tmp, schema.json)
      Files.move(tmp, dir.resolve(GraftCatalog.SchemaFile),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    }
    new GraftTable(ident.name(), dir.toString, schema)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("ALTER TABLE is not supported")

  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!Files.exists(dir.resolve(GraftCatalog.SchemaFile))) false
    else {
      IndexStore.withArtifactLock(GraftCatalog.lockName(dir)) {
        IndexStore.deleteRecursively(dir)
      }
      true
    }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = dirFor(oldIdent)
    val to = dirFor(newIdent)
    if (!Files.exists(from.resolve(GraftCatalog.SchemaFile)))
      throw new NoSuchTableException(oldIdent)
    if (Files.exists(to.resolve(GraftCatalog.SchemaFile)))
      throw new TableAlreadyExistsException(newIdent)
    Files.move(from, to)
  }
}

object GraftCatalog {
  val SchemaFile = "schema.json"
  val DataDir = "data"
  val VersionsDir = ".v"
  val ManifestFile = "manifest"
  val PointerName = "current"

  /** Superseded versions (and unreferenced data-file orphans) younger
    * than this are never collected — a reader that resolved the pointer
    * before a swap keeps its files, exactly the index store's grace
    * discipline. Spec-tunable. */
  @volatile var GraceMs: Long = 10L * 60L * 1000L

  /** One data file of one committed version: pool file name + rows. */
  final case class ManifestEntry(file: String, rows: Long)

  private[sources] def lockName(tableDir: Path): String =
    "gcat_" + tableDir.toAbsolutePath.toString
      .replaceAll("[^A-Za-z0-9._-]", "_").takeRight(80)

  private[sources] def readManifest(version: Path): Seq[ManifestEntry] = {
    val f = version.resolve(ManifestFile)
    if (!Files.exists(f)) Nil
    else Files.readAllLines(f).asScala.toSeq.filter(_.nonEmpty).map { line =>
      val Array(name, rows) = line.split('\t')
      ManifestEntry(name, rows.toLong)
    }
  }

  private[sources] def currentManifest(tableDir: Path): Seq[ManifestEntry] =
    IndexStore.pointer.resolve(tableDir, PointerName)
      .map(readManifest).getOrElse(Nil)

  /** The commit critical section: under the per-table lock, publish a
    * new manifest version = (previous entries unless truncating) ++
    * `added`, swap the pointer, then GC grace-expired superseded
    * versions and grace-expired unreferenced data-file orphans (failed
    * writes' leftovers, speculative duplicates). */
  private[sources] def commitVersion(tableDir: Path,
      added: Seq[ManifestEntry], truncate: Boolean): Unit =
    IndexStore.withArtifactLock(lockName(tableDir)) {
      val previous = IndexStore.pointer.resolve(tableDir, PointerName)
      val base = if (truncate) Nil else previous.map(readManifest).getOrElse(Nil)
      val token = UUID.randomUUID().toString.take(12)
      val vdir = tableDir.resolve(VersionsDir).resolve(token)
      Files.createDirectories(vdir)
      Files.writeString(vdir.resolve(ManifestFile),
        (base ++ added).map(e => s"${e.file}\t${e.rows}").mkString("\n"))
      IndexStore.pointer.swap(tableDir, PointerName, vdir)
      // stamp SUPERSESSION time so grace measures "since replaced"
      previous.foreach { p =>
        try Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
        catch { case NonFatal(_) => () }
      }
      gcVersions(tableDir, keep = Set(token) ++
        previous.map(_.getFileName.toString))
      sweepOrphans(tableDir)
    }

  /** Best-effort removal of superseded versions past the grace window;
    * the freshly published version and its immediate predecessor are
    * always kept (in-flight readers). */
  private def gcVersions(tableDir: Path, keep: Set[String]): Unit = {
    val vroot = tableDir.resolve(VersionsDir)
    val now = System.currentTimeMillis()
    if (Files.isDirectory(vroot)) {
      val listing = Files.list(vroot)
      try listing.forEach { p =>
        val expired =
          try now - Files.getLastModifiedTime(p).toMillis >= GraceMs
          catch { case NonFatal(_) => false }
        if (!keep.contains(p.getFileName.toString) && expired)
          try IndexStore.deleteRecursively(p) catch { case NonFatal(_) => () }
      } finally listing.close()
    }
  }

  /** Best-effort removal of data-pool files REFERENCED BY NO surviving
    * manifest and older than the grace window — the leftovers of aborted
    * writes, crashed drivers, and speculative task duplicates. Runs
    * under the commit lock, so no concurrent commit can be mid-way to
    * referencing a file this sweep looks at (a not-yet-committed
    * writer's files are younger than any realistic grace anyway). */
  private def sweepOrphans(tableDir: Path): Unit = {
    val vroot = tableDir.resolve(VersionsDir)
    val referenced: Set[String] =
      if (!Files.isDirectory(vroot)) Set.empty
      else {
        val listing = Files.list(vroot)
        try listing.iterator().asScala
          .flatMap(v => readManifest(v).map(_.file)).toSet
        finally listing.close()
      }
    val dataDir = tableDir.resolve(DataDir)
    val now = System.currentTimeMillis()
    if (Files.isDirectory(dataDir)) {
      val listing = Files.list(dataDir)
      try listing.forEach { p =>
        val expired =
          try now - Files.getLastModifiedTime(p).toMillis >= GraceMs
          catch { case NonFatal(_) => false }
        if (!referenced.contains(p.getFileName.toString) && expired)
          try Files.deleteIfExists(p) catch { case NonFatal(_) => () }
      } finally listing.close()
    }
  }
}

/** One catalog table: batch read of the current manifest snapshot +
  * staged-commit batch write (append or truncate). */
private[sources] class GraftTable(tableName: String, tableDir: String,
    tableSchema: StructType) extends Table with SupportsRead with SupportsWrite {

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(tableDir, tableSchema)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(tableDir, tableSchema)
}

private class GraftScanBuilder(tableDir: String, schema: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = {
    // resolve the pointer ONCE: the scan reads an immutable snapshot —
    // a commit racing this query cannot swap files mid-scan
    val files = GraftCatalog.currentManifest(Paths.get(tableDir))
    new GraftTableScan(tableDir, schema, required, files)
  }
}

private class GraftTableScan(tableDir: String, schema: StructType,
    required: StructType, files: Seq[GraftCatalog.ManifestEntry])
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_table dir=$tableDir files=${files.size} " +
      s"rows=${files.map(_.rows).sum} cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(e => GraftFileSplit(
      Paths.get(tableDir, GraftCatalog.DataDir, e.file).toString))
      .toArray[InputPartition]
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(schema, required.fieldNames)
}

private case class GraftFileSplit(path: String) extends InputPartition

private class GraftReaderFactory(schema: StructType,
    requiredNames: Array[String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[GraftFileSplit]
    val ordinals = requiredNames.map(n => schema.fieldIndex(n))
    val in = new DataInputStream(new java.io.BufferedInputStream(
      Files.newInputStream(Paths.get(split.path))))
    new PartitionReader[InternalRow] {
      private var current: InternalRow = _
      override def next(): Boolean = {
        val full = GraftRowCodec.read(in, schema)
        if (full == null) false
        else {
          // projection-level pruning: the row format parses every field,
          // but only the REQUIRED ordinals are emitted
          val out = new GenericInternalRow(ordinals.length)
          var i = 0
          while (i < ordinals.length) {
            out.update(i, full.get(ordinals(i), schema.fields(ordinals(i)).dataType))
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

private class GraftWriteBuilder(tableDir: String, schema: StructType)
  extends WriteBuilder with SupportsTruncate {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new GraftBatchWrite(tableDir, schema, truncateFirst)
    override def description(): String =
      s"graft_table dir=$tableDir truncate=$truncateFirst"
  }
}

/** One staged file's identity, sent back from a committed writer task. */
private case class GraftFileMsg(file: String, rows: Long)
  extends WriterCommitMessage

private class GraftBatchWrite(tableDir: String, schema: StructType,
    truncateFirst: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(tableDir, schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCatalog.commitVersion(Paths.get(tableDir),
      messages.toSeq.collect { case GraftFileMsg(f, n) =>
        GraftCatalog.ManifestEntry(f, n) },
      truncateFirst)
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    // unlink what committed tasks staged; files of FAILED tasks were
    // already unlinked by their writer's abort(), and anything a crash
    // left behind is unreferenced and falls to the grace-aged sweep
    messages.foreach {
      case GraftFileMsg(f, _) =>
        try Files.deleteIfExists(
          Paths.get(tableDir, GraftCatalog.DataDir, f))
        catch { case NonFatal(_) => () }
      case _ => ()
    }
}

private class GraftWriterFactory(tableDir: String, schema: StructType)
  extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(tableDir, schema, partitionId, taskId)
}

/** One task's staged-file writer: a uniquely-named pool file, invisible
  * until the driver's commit references it from a manifest. */
private class GraftDataWriter(tableDir: String, schema: StructType,
    partitionId: Int, taskId: Long) extends DataWriter[InternalRow] {
  private val fileName =
    s"part-$partitionId-$taskId-${UUID.randomUUID().toString.take(8)}.gbin"
  private val path = Paths.get(tableDir, GraftCatalog.DataDir, fileName)
  Files.createDirectories(path.getParent)
  private var out: DataOutputStream =
    new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(path)))
  private val types = schema.fields.map(_.dataType)
  private var rows = 0L

  override def write(row: InternalRow): Unit = {
    GraftRowCodec.write(out, types, row)
    rows += 1
  }
  override def commit(): WriterCommitMessage = {
    out.close(); out = null
    GraftFileMsg(fileName, rows)
  }
  override def abort(): Unit = {
    if (out != null) { try out.close() catch { case NonFatal(_) => () }; out = null }
    Files.deleteIfExists(path)
  }
  override def close(): Unit =
    if (out != null) { try out.close() catch { case NonFatal(_) => () }; out = null }
}

/** Row codec of the graft table format: per row, per field in schema
  * order, one null byte then the value — fixed-width scalars inline,
  * strings/binary length-prefixed. A row starts with a presence byte so
  * EOF detection is unambiguous. */
private[sources] object GraftRowCodec {

  def supported(dt: DataType): Boolean = dt match {
    case BooleanType | IntegerType | LongType | FloatType | DoubleType |
         StringType | BinaryType | DateType | TimestampType |
         TimestampNTZType => true
    case _ => false
  }

  def write(out: DataOutputStream, types: Array[DataType], row: InternalRow): Unit = {
    out.writeByte(1)
    var i = 0
    while (i < types.length) {
      if (row.isNullAt(i)) out.writeBoolean(true)
      else {
        out.writeBoolean(false)
        types(i) match {
          case BooleanType => out.writeBoolean(row.getBoolean(i))
          case IntegerType | DateType => out.writeInt(row.getInt(i))
          case LongType | TimestampType | TimestampNTZType =>
            out.writeLong(row.getLong(i))
          case FloatType => out.writeFloat(row.getFloat(i))
          case DoubleType => out.writeDouble(row.getDouble(i))
          case StringType =>
            val b = row.getUTF8String(i).getBytes
            out.writeInt(b.length); out.write(b)
          case BinaryType =>
            val b = row.getBinary(i)
            out.writeInt(b.length); out.write(b)
          case other =>
            throw new IllegalStateException(s"unsupported type $other")
        }
      }
      i += 1
    }
  }

  /** Next full row, or null at clean EOF. A torn trailing row (the file
    * of a crashed UNCOMMITTED writer — never referenced by a manifest,
    * so never legitimately read) would surface as EOFException, loudly. */
  def read(in: DataInputStream, schema: StructType): InternalRow = {
    val marker = in.read()
    if (marker < 0) return null
    if (marker != 1) throw new EOFException(s"corrupt row marker $marker")
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      if (!in.readBoolean()) {
        schema.fields(i).dataType match {
          case BooleanType => row.setBoolean(i, in.readBoolean())
          case IntegerType | DateType => row.setInt(i, in.readInt())
          case LongType | TimestampType | TimestampNTZType =>
            row.setLong(i, in.readLong())
          case FloatType => row.setFloat(i, in.readFloat())
          case DoubleType => row.setDouble(i, in.readDouble())
          case StringType =>
            val b = new Array[Byte](in.readInt()); in.readFully(b)
            row.update(i, UTF8String.fromBytes(b))
          case BinaryType =>
            val b = new Array[Byte](in.readInt()); in.readFully(b)
            row.update(i, b)
          case other =>
            throw new IllegalStateException(s"unsupported type $other")
        }
      }
      i += 1
    }
    row
  }
}
