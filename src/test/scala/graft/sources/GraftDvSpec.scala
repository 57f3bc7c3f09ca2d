package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion vectors (`graft.delete.mode` = `dv`): merge-on-read deletes
  * that write masks instead of rewriting files — masking reads, DV
  * union across deletes, fully-masked file drop, time travel pinning
  * each version's exact mask, OPTIMIZE materialization, change-feed
  * delta reads, the table-stream loudness contract, and COW interop. */
class GraftDvSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"dvspec$n"
    val root = graft.TempDirs.create("dv-spec")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def dvTable(cat: String, name: String, cols: String): Unit =
    spark.sql(s"""CREATE TABLE $cat.$name ($cols)
      TBLPROPERTIES ('graft.delete.mode' = 'dv')""")

  private def dataFiles(dir: Path): Set[String] =
    GraftCatalog.currentManifest(dir).map(_.file).toSet

  test("a DV delete removes rows without touching a data file") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "t", "id BIGINT, v DOUBLE")
    spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 1000)")
    val dir = root.resolve("t")
    val before = dataFiles(dir)
    // the predicate must be source-translatable (range, not modulo) or
    // Spark routes DELETE through the row-level COW path instead
    spark.sql(s"DELETE FROM $cat.t WHERE id >= 430 AND id < 530")
    assert(dataFiles(dir) == before,
      "dv mode must keep every data file in place")
    val m = GraftCatalog.currentManifest(dir)
    assert(m.map(_.liveRows).sum == 900L &&
      m.map(_.rows).sum == 1000L &&
      m.exists(_.dv.isDefined))
    // reads mask exactly the deleted rows
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id >= 430 AND id < 530")
      .head().getLong(0) == 0L)
    assert(spark.sql(s"SELECT CAST(sum(id) AS BIGINT) FROM $cat.t")
      .head().getLong(0) ==
      (0L until 1000L).filterNot(i => i >= 430 && i < 530).sum)
  }

  test("successive deletes union into fresh immutable DVs; time travel pins each mask") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "u", "id BIGINT")
    spark.sql(s"INSERT INTO $cat.u SELECT id FROM range(0, 100, 1, 1)") // 1
    spark.sql(s"DELETE FROM $cat.u WHERE id < 10") // 2
    spark.sql(s"DELETE FROM $cat.u WHERE id >= 90") // 3
    val dir = root.resolve("u")
    val e = GraftCatalog.currentManifest(dir).head
    assert(e.dv.exists(_.masked == 20L) && e.liveRows == 80L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.u").head().getLong(0) == 80L)
    // each version pins its exact mask
    assert(spark.sql(s"SELECT count(*) FROM $cat.u VERSION AS OF '1'")
      .head().getLong(0) == 100L)
    assert(spark.sql(s"SELECT count(*) FROM $cat.u VERSION AS OF '2'")
      .head().getLong(0) == 90L)
    // a fully-masking delete drops the entry entirely
    spark.sql(s"DELETE FROM $cat.u WHERE id >= 0")
    assert(GraftCatalog.currentManifest(dir).isEmpty)
    assert(spark.sql(s"SELECT count(*) FROM $cat.u").head().getLong(0) == 0L)
  }

  test("OPTIMIZE materializes masks away and conserves live rows") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "o", "id BIGINT")
    spark.sql(s"INSERT INTO $cat.o SELECT id FROM range(0, 500, 1, 1)")
    spark.sql(s"DELETE FROM $cat.o WHERE id >= 100 AND id < 170")
    val dir = root.resolve("o")
    assert(GraftCatalog.currentManifest(dir).exists(_.dv.isDefined))
    GraftCatalog.compact(dir)
    val after = GraftCatalog.currentManifest(dir)
    assert(after.size == 1 && after.forall(_.dv.isEmpty))
    assert(after.head.rows == 430L)
    assert(spark.sql(s"SELECT CAST(sum(id) AS BIGINT) FROM $cat.o")
      .head().getLong(0) ==
      (0L until 500L).filterNot(i => i >= 100 && i < 170).sum)
  }

  test("the change feed reads a DV delete as exactly the newly masked rows") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "c", "id BIGINT")
    spark.sql(s"INSERT INTO $cat.c SELECT id FROM range(0, 200, 1, 1)") // 1
    spark.sql(s"DELETE FROM $cat.c WHERE id < 20") // 2
    spark.sql(s"DELETE FROM $cat.c WHERE id < 40") // 3: only [20,40) is new
    val dir = root.resolve("c")
    def changes(from: Long, to: Long) =
      spark.read.format("graft.sources.GraftChangeFeed")
        .option("table", dir.toString)
        .option("fromSeq", from.toString).option("toSeq", to.toString).load()
    val second = changes(2L, 3L).collect()
    assert(second.length == 20 &&
      second.forall(_.getString(1) == "delete") &&
      second.map(_.getLong(0)).sorted.toSeq == (20L until 40L),
      "the delta read must emit exactly the newly masked ordinals")
    // applying the whole feed reconstructs the final state
    val all = changes(0L, 3L)
    val mirror = all.where(col("_change_type") === "insert").select("id")
      .exceptAll(all.where(col("_change_type") === "delete").select("id"))
    assert(mirror.count() == 160L &&
      mirror.agg(sum("id")).head().getLong(0) == (40L until 200L).sum)
  }

  test("the append-only table stream refuses DV growth loudly") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "s", "id BIGINT")
    spark.sql(s"INSERT INTO $cat.s SELECT id FROM range(0, 50)") // 1
    spark.sql(s"DELETE FROM $cat.s WHERE id < 5") // 2
    val q = spark.readStream.table(s"$cat.s").writeStream
      .outputMode("append").format("memory").queryName(s"dv_stream_$n")
      .option("checkpointLocation", graft.TempDirs.create("dv-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[Exception] { q.awaitTermination(120000L) }
    def chain(t: Throwable): String = {
      val sb = new StringBuilder
      var x: Throwable = t
      while (x != null) { sb.append(x.getMessage).append(" | "); x = x.getCause }
      sb.toString
    }
    assert(chain(e).contains("deletion vectors"), s"got: ${chain(e)}")
  }

  test("COW ops on a masked file never resurrect dead rows") {
    val (cat, root) = freshCatalog()
    dvTable(cat, "w", "id BIGINT, v DOUBLE")
    spark.sql(s"INSERT INTO $cat.w SELECT id, CAST(id AS DOUBLE) FROM range(0, 100, 1, 1)")
    spark.sql(s"DELETE FROM $cat.w WHERE id < 10") // dv mask
    // the COW UPDATE rewrites the masked file: survivors only, no DV out
    spark.sql(s"UPDATE $cat.w SET v = -1.0 WHERE id >= 50")
    val dir = root.resolve("w")
    assert(GraftCatalog.currentManifest(dir).forall(_.dv.isEmpty),
      "a COW rewrite must materialize the mask, not carry it")
    val r = spark.sql(
      s"SELECT count(*) AS n, CAST(sum(v) AS BIGINT) AS s FROM $cat.w").head()
    assert(r.getLong(0) == 90L)
    assert(r.getLong(1) == (10L until 50L).sum - 50L)
    // constraint validation also sees only live rows: dead rows cannot
    // block a new constraint
    spark.sql(s"ALTER TABLE $cat.w SET TBLPROPERTIES ('graft.check.idmin' = 'id >= 10')")
  }

  test("the registered DV-delete scenario is layout-independent (32-way range parallelism)") {
    // r17 optimization-round regression: src_dsv2_dv_delete's in-query
    // fileset-equality assertion held only while range()'s default slice
    // count kept files bigger than the deleted id ranges — at
    // SPARK_GRAFT_CPUS=32 the 12k rows landed in 375-row files, a 1000-id
    // delete fully masked whole files, and the DV path's documented
    // fully-masked-file DROP broke the "no file dropped" require. The
    // insert now pins 4 slices; this spec drives the exact failing
    // condition (leaf parallelism 32) through the REGISTERED query.
    val key = "spark.sql.leafNodeDefaultParallelism"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "32")
    try {
      val out = Formats.dsv2DvDelete(spark, "/root/testdata/sf0.001")
      assert(out.count() == 16L) // one row per bucket
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
