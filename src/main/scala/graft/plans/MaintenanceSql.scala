package graft.plans

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{IntegerType, LongType}

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
case class OptimizeGraftTable(parts: Seq[String]) extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("version", LongType, nullable = false)(),
    AttributeReference("files_before", IntegerType, nullable = false)(),
    AttributeReference("files_after", IntegerType, nullable = false)(),
    AttributeReference("row_count", LongType, nullable = false)())

  private def fail(msg: String): Nothing =
    CustomJoinResolution.fail("OPTIMIZE", msg)

  override def run(spark: SparkSession): Seq[Row] = {
    val (catName, table) = parts match {
      case Seq(c, t) => (c, t)
      case _ => fail(
        s"OPTIMIZE requires a two-part graft table name " +
          s"(catalog.table); got ${parts.mkString(".")}")
    }
    val impl = spark.conf.getOption(s"spark.sql.catalog.$catName").getOrElse(
      fail(s"$catName is not a registered catalog"))
    if (impl != classOf[GraftCatalog].getName)
      fail(s"$catName is not a graft catalog (found $impl); OPTIMIZE " +
        "compacts graft tables only")
    val root = spark.conf.getOption(s"spark.sql.catalog.$catName.root")
      .getOrElse("/tmp/graft_catalog")
    val dir = Paths.get(root, table)
    if (!Files.exists(dir.resolve(GraftCatalog.SchemaFile)))
      fail(s"table $catName.$table does not exist")
    val before = GraftCatalog.currentManifest(dir).size
    val seq = GraftCatalog.compact(dir)
    val after = GraftCatalog.currentManifest(dir)
    Seq(Row(seq, before, after.size, after.map(_.rows).sum))
  }
}
