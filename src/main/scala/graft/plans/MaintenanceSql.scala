package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, TimestampType}

import graft.sources.GraftCatalog

/** `OPTIMIZE <catalog>.<table>` — the maintenance verb every table
  * format ships, landed through the SAME injected-parser surface as the
  * custom joins ([[GraftSqlParser]]): the statement parses to this
  * command, which runs [[GraftCatalog.compact]] behind the table's
  * pointer-swap commit (readers never blocked; the superseded version
  * keeps serving time travel until grace GC) and returns the published
  * version with the file-count drop as the result row.
  *
  * The table is resolved through the PUBLIC conf surface
  * (`spark.sql.catalog.<name>` / `.root`) rather than internal session
  * state, so the command needs the explicit two-part `catalog.table`
  * name — the same registration a cluster user wrote to mount the
  * catalog. Non-graft catalogs are refused loudly. */
/** `DESCRIBE HISTORY <catalog>.<table>` — the audit face every table
  * format ships: one row per SURVIVING version (history retention is
  * the GC window, so what this lists is exactly what `VERSION AS OF`
  * can still serve), newest first: commit seq, supersession/publish
  * mtime, file count, row count, idempotency tag (streaming-epoch
  * commits), and whether it is the current version. */
case class DescribeGraftHistory(parts: Seq[String])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("modified_at", TimestampType, nullable = false)(),
    AttributeReference("files", IntegerType, nullable = false)(),
    AttributeReference("row_count", LongType, nullable = false)(),
    AttributeReference("commit_tag", StringType, nullable = true)(),
    AttributeReference("is_current", BooleanType, nullable = false)(),
    AttributeReference("operation", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = MaintenanceSql.resolveGraftTable(spark, "DESCRIBE HISTORY", parts)
    GraftCatalog.describeHistory(dir).map { h =>
      Row(h.seq, new java.sql.Timestamp(h.modifiedMs), h.files, h.rows,
        h.tag.orNull, h.isCurrent, h.kind.orNull)
    }
  }
}

/** `VACUUM <catalog>.<table> [RETAIN <n> HOURS]` — the explicit-GC verb:
  * reclaims superseded versions and unreferenced pool files older than
  * the retention (default: the catalog's grace window). The CURRENT
  * version is always kept; the retention window IS the in-flight-reader
  * and time-travel protection, the standard table-format contract.
  * Returns (versions_removed, files_removed). */
case class VacuumGraftTable(parts: Seq[String], retainHours: Option[Long])
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("versions_removed", IntegerType, nullable = false)(),
    AttributeReference("files_removed", IntegerType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = MaintenanceSql.resolveGraftTable(spark, "VACUUM", parts)
    val retainMs = retainHours.map(_ * 3600L * 1000L)
      .getOrElse(GraftCatalog.GraceMs)
    val (v, f) = GraftCatalog.vacuum(dir, retainMs)
    Seq(Row(v, f))
  }
}

private[plans] object MaintenanceSql {
  /** Shared table resolution of the maintenance verbs: the PUBLIC conf
    * surface (`spark.sql.catalog.<name>` / `.root`), graft catalogs
    * only, loud on anything else. */
  def resolveGraftTable(spark: SparkSession, op: String,
      parts: Seq[String]): java.nio.file.Path = {
    def fail(msg: String): Nothing = CustomJoinResolution.fail(op, msg)
    val (catName, table) = parts match {
      case Seq(c, t) => (c, t)
      case _ => fail(s"$op requires a two-part graft table name " +
        s"(catalog.table); got ${parts.mkString(".")}")
    }
    val impl = spark.conf.getOption(s"spark.sql.catalog.$catName").getOrElse(
      fail(s"$catName is not a registered catalog"))
    if (impl != classOf[GraftCatalog].getName)
      fail(s"$catName is not a graft catalog (found $impl); $op " +
        "operates on graft tables only")
    val root = spark.conf.getOption(s"spark.sql.catalog.$catName.root")
      .getOrElse("/tmp/graft_catalog")
    val dir = Paths.get(root, table)
    if (!Files.exists(dir.resolve(GraftCatalog.SchemaFile)))
      fail(s"table $catName.$table does not exist")
    dir
  }
}

/** `OPTIMIZE <t>` coalesces the pool into one file; `OPTIMIZE <t>
  * ZORDER BY (c1, ...)` instead rewrites the table multi-dimensionally
  * clustered ([[GraftCatalog.compactZorder]]) so per-file min/max prune
  * on every named column. Both publish data-change-false commits. */
case class OptimizeGraftTable(parts: Seq[String],
    zorderBy: Seq[String] = Nil) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)(),
    AttributeReference("row_count", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val dir = MaintenanceSql.resolveGraftTable(spark, "OPTIMIZE", parts)
    val before = GraftCatalog.currentManifest(dir).size
    val seq =
      if (zorderBy.isEmpty) GraftCatalog.compact(dir)
      else GraftCatalog.compactZorder(dir, zorderBy)
    val after = GraftCatalog.currentManifest(dir)
    Seq(Row(seq, before, after.size, after.map(_.liveRows).sum))
  }
}
