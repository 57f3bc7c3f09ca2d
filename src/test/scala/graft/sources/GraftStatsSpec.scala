package graft.sources

import java.nio.file.{Files, Path}

import org.apache.spark.sql.Row
import graft.SparkSpec
import graft.similarity.IndexStore

/** The catalog table's QUERY-PLANNING integration (round 17
  * continuation): per-file column statistics collected at write,
  * planning-time FILE SKIPPING off the pushed filters, manifest-exact
  * scan statistics driving unhinted broadcast, additive SCHEMA
  * EVOLUTION over the per-file width ledger, and the group-based
  * copy-on-write ROW-LEVEL OPERATIONS (SQL UPDATE / MERGE INTO) that
  * replace exactly the scanned files under serializable conflict
  * detection. */
class GraftStatsSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"gstat$n"
    val root = graft.TempDirs.create("gstat-spec")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  /** files=K/N of the single graft scan in the query's executed plan. */
  private def scannedFiles(sql: String): (Int, Int) = {
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    val m = "files=(\\d+)/(\\d+)".r.findFirstMatchIn(plan).getOrElse(
      fail(s"no graft scan in plan:\n$plan"))
    (m.group(1).toInt, m.group(2).toInt)
  }

  test("writer-collected stats skip files at planning time, conservatively") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, s STRING, v DOUBLE)")
    // three commits with disjoint id ranges and disjoint string ranges
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('a', id), 0.5 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('m', id), 0.5 FROM range(100, 200)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, concat('z', id), 0.5 FROM range(200, 300)")
    val total = GraftCatalog.currentManifest(root.resolve("t")).size
    assert(total >= 3)

    // range predicate on id: only the last commit's files survive
    val (k1, n1) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE id >= 200")
    assert(n1 == total && k1 < total && k1 > 0, s"$k1/$n1")
    // equality far outside every range: ALL files skipped
    val (k2, _) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE id = 9999")
    assert(k2 == 0, s"expected full skip, scanned $k2")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id = 9999")
      .head().getLong(0) == 0L)
    // string prefix: files of the 'z' commit only
    val (k3, _) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE s LIKE 'z%'")
    assert(k3 < total, s"prefix skip must prune, scanned $k3/$total")
    // correctness under skipping: the surviving aggregate is exact
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id >= 200")
      .head().getLong(0) == 100L)
    // OR of two ranges keeps both ends, skips the middle commit
    val (k4, _) = scannedFiles(
      s"SELECT count(*) AS n FROM $cat.t WHERE id < 50 OR id >= 250")
    assert(k4 < total, s"$k4/$total")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE id < 50 OR id >= 250")
      .head().getLong(0) == 100L)
    // a predicate on an unstatted shape (expression, not column) skips
    // nothing and stays correct
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE id % 100 = 0")
      .head().getLong(0) == 3L)
  }

  test("null-aware skipping: IsNull / IsNotNull / all-null files") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 0.5 FROM range(0, 50)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(NULL AS DOUBLE) FROM range(50, 100)")
    val total = GraftCatalog.currentManifest(root.resolve("t")).size
    // v IS NULL skips the no-null commit's files
    val (k1, _) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE v IS NULL")
    assert(k1 < total, s"$k1/$total")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE v IS NULL")
      .head().getLong(0) == 50L)
    // v IS NOT NULL skips the all-null commit's files
    val (k2, _) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE v IS NOT NULL")
    assert(k2 < total, s"$k2/$total")
    // an equality on the all-null column skips the all-null files too
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE v = 0.5")
      .head().getLong(0) == 50L)
    // null-safe equality against NULL finds only the null rows
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE v <=> CAST(NULL AS DOUBLE)")
      .head().getLong(0) == 50L)
  }

  test("skipping order agrees with SPARK's evaluation order (review-found class)") {
    // (1) strings: UTF-16 String.compareTo puts U+E000 ABOVE a
    // supplementary char; Spark's UTF8 binary order puts it BELOW.
    // A U+E000 row must survive a `< '😀'` predicate's skipping.
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (s STRING)")
    spark.sql(s"INSERT INTO $cat.t VALUES ('')")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s < '😀'")
      .head().getLong(0) == 1L,
      "UTF-16-ordered stats would have skipped the U+E000 file")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s > '😀'")
      .head().getLong(0) == 0L)
    // (2) doubles: raw Double.compare puts -0.0 < 0.0; Spark evaluates
    // -0.0 >= 0.0 as TRUE. A -0.0 row must survive a `>= 0.0` skip.
    spark.sql(s"CREATE TABLE $cat.d (v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.d VALUES (CAST(-0.0 AS DOUBLE))")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.d WHERE v >= 0.0")
      .head().getLong(0) == 1L,
      "raw-Double-ordered stats would have skipped the -0.0 file")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.d WHERE v <= 0.0")
      .head().getLong(0) == 1L)
    // (3) the ASCII-only prefix successor: a non-ASCII 64-char prefix
    // yields NO upper bound (conservative), never a wrong one
    assert(GraftStats.prefixSuccessor("é" * 64).isEmpty)
    assert(GraftStats.prefixSuccessor("abc").contains("abd"))
  }

  test("string bounds truncate conservatively; prefix successor rounds up") {
    assert(GraftStats.prefixSuccessor("abc").contains("abd"))
    // non-ASCII prefixes have no sound byte-order successor: None, not
    // a UTF-16 bump (which can collapse below the prefix in UTF-8)
    assert(GraftStats.prefixSuccessor("a" + Char.MaxValue).isEmpty)
    assert(GraftStats.prefixSuccessor(Char.MaxValue.toString).isEmpty)
    // DEL (0x7f) is not bumpable (successor must stay single-byte)
    assert(GraftStats.prefixSuccessor("a").contains("b"))
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (s STRING)")
    val long = "k" * 200 // forces bound truncation at 64 chars
    spark.sql(s"INSERT INTO $cat.t VALUES ('${long}1'), ('${long}2')")
    // a predicate INSIDE the truncated range must not be skipped
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE s = '${long}2'")
      .head().getLong(0) == 1L)
    // a predicate past the rounded-up max IS skipped, and correctly so
    val (k, total) = scannedFiles(s"SELECT count(*) AS n FROM $cat.t WHERE s >= 'l'")
    assert(k == 0 && total >= 1, s"$k/$total")
  }

  test("manifest statistics drive an unhinted broadcast join") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.dim (k INT, name STRING)")
    spark.sql(s"INSERT INTO $cat.dim SELECT CAST(id AS INT), concat('n', id) FROM range(0, 20)")
    val q = spark.sql(
      s"""SELECT d.name, count(*) AS n
         |FROM range(0, 10000) f JOIN $cat.dim d ON CAST(f.id % 20 AS INT) = d.k
         |GROUP BY d.name""".stripMargin)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"20 manifest rows must broadcast unhinted:\n$plan")
    assert(q.collect().forall(_.getLong(1) == 500L))
    // and the scan's reported stats are manifest-exact
    val scan = spark.sql(s"SELECT * FROM $cat.dim").queryExecution.optimizedPlan
      .collect { case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r }
      .head
    val stats = scan.scan
      .asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
      .estimateStatistics()
    assert(stats.numRows().getAsLong == 20L)
    assert(stats.sizeInBytes().getAsLong > 0L)
  }

  test("ALTER TABLE ADD COLUMN: old files null-fill; guards are loud") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, a STRING)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'old' FROM range(0, 40)")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMN v DOUBLE")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 'new', 1.5 FROM range(40, 60)")
    // old era reads as NULL v; new era carries values
    assert(spark.sql(
      s"SELECT count(*) AS n, count(v) AS nv FROM $cat.t").head() == Row(60L, 20L))
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.t WHERE v IS NULL AND a = 'old'")
      .head().getLong(0) == 40L)
    // projection of ONLY the evolved column from an old file
    assert(spark.sql(s"SELECT v FROM $cat.t WHERE id < 40").collect()
      .forall(_.isNullAt(0)))
    // the width ledger: pre-ALTER entries are narrower than the schema
    val widths = GraftCatalog.currentManifest(root.resolve("t")).map(_.cols).toSet
    assert(widths == Set(2, 3), widths.toString)
    // DELETE and compaction rewrite old rows at the CURRENT width
    spark.sql(s"DELETE FROM $cat.t WHERE id = 5")
    GraftCatalog.compact(root.resolve("t"))
    assert(spark.sql(
      s"SELECT count(*) AS n, count(v) AS nv FROM $cat.t").head() == Row(59L, 20L))
    assert(GraftCatalog.currentManifest(root.resolve("t")).map(_.cols).toSet == Set(3))
    // guard rails
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t ADD COLUMN v INT") } // dup
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN w INT NOT NULL")
    }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ADD COLUMN w INT FIRST")
    }
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t DROP COLUMN a") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN a TO b") }
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN id TYPE INT")
    }
    // evolution composes with time travel: the pre-ALTER snapshot read
    // under the CURRENT schema null-fills the evolved tail
    val seq1Count = spark.sql(
      s"SELECT count(*) AS n, count(v) AS nv FROM $cat.t VERSION AS OF '1'").head()
    assert(seq1Count == Row(40L, 0L))
  }

  test("SQL UPDATE rewrites only affected files; clean files carry by reference") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(100, 200)")
    val dir = root.resolve("t")
    val before = GraftCatalog.currentManifest(dir).map(_.file).toSet
    spark.sql(s"UPDATE $cat.t SET v = 2.0 WHERE id >= 150")
    val after = GraftCatalog.currentManifest(dir)
    // the first commit's files (ids < 100) were skipped by stats and
    // carried over BY REFERENCE; the second commit's files were replaced
    val carried = before.intersect(after.map(_.file).toSet)
    assert(carried.nonEmpty, "stats-clean files must carry by reference")
    assert(after.map(_.rows).sum == 200L)
    assert(spark.sql(
      s"SELECT CAST(sum(CAST(v AS DECIMAL(10,1))) AS DOUBLE) AS s FROM $cat.t")
      .head().getDouble(0) == 250.0)
    // null semantics: UPDATE with a predicate over NULL leaves it alone
    spark.sql(s"INSERT INTO $cat.t VALUES (999, CAST(NULL AS DOUBLE))")
    spark.sql(s"UPDATE $cat.t SET v = 9.0 WHERE v < 0.0")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t WHERE v IS NULL")
      .head().getLong(0) == 1L)
  }

  test("MERGE INTO upserts through the COW commit") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(0, 100)")
    spark.sql(
      s"""MERGE INTO $cat.t t
         |USING (SELECT id, 10.0 AS v FROM range(50, 150)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = t.v + s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |""".stripMargin)
    val out = spark.sql(
      s"""SELECT count(*) AS n,
         |  CAST(sum(CAST(v AS DECIMAL(10,1))) AS DOUBLE) AS s FROM $cat.t""".stripMargin).head()
    // 50 untouched (1.0) + 50 updated (11.0) + 50 inserted (10.0)
    assert(out == Row(150L, 50.0 + 550.0 + 500.0))
    // MERGE with a DELETE action
    spark.sql(
      s"""MERGE INTO $cat.t t
         |USING (SELECT id FROM range(0, 25)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN DELETE
         |""".stripMargin)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) == 125L)
  }

  test("runtime group filtering: a selective MERGE rewrites only matching files") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    // two commits; MERGE has no static predicate to skip on (the source
    // ids are only known at runtime), so without runtime group filtering
    // EVERY file would be rewritten
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(100, 200)")
    val dir = root.resolve("t")
    val before = GraftCatalog.currentManifest(dir).map(_.file).toSet
    spark.sql(
      s"""MERGE INTO $cat.t t
         |USING (SELECT id, 5.0 AS v FROM range(190, 210)) s
         |ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
         |""".stripMargin)
    val after = GraftCatalog.currentManifest(dir)
    // the dynamic _file subquery proves the sub-190 files match-free:
    // they carry over BY REFERENCE (same pool file names)
    val carried = before.intersect(after.map(_.file).toSet)
    assert(carried.nonEmpty,
      "runtime group filtering must carry match-free files by reference")
    val out = spark.sql(
      s"""SELECT count(*) AS n,
         |  CAST(sum(CAST(v AS DECIMAL(10,1))) AS DOUBLE) AS s FROM $cat.t""".stripMargin).head()
    // 190 rows at 1.0, 10 updated to 5.0, 10 inserted at 5.0
    assert(out == Row(210L, 190.0 + 50.0 + 50.0))
  }

  test("a commit racing a row-level operation is detected, not lost") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(0, 100)")
    val dir = root.resolve("t")
    // pin a COW operation's scan manually (the planning-time step), then
    // let a foreign commit land before its write commits
    val table = new GraftTable("t", dir.toString,
      GraftCatalog.tableSchema(dir))
    val op = table.newRowLevelOperationBuilder(
      new org.apache.spark.sql.connector.write.RowLevelOperationInfo {
        override def command() =
          org.apache.spark.sql.connector.write.RowLevelOperation.Command.UPDATE
        override def options() =
          org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()
      }).build()
    val sb = op.newScanBuilder(
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty())
    sb.build().toBatch.planInputPartitions() // pins the snapshot
    // the racing commit
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(100, 110)")
    // the stale COW write must refuse at commit
    val wb = op.newWriteBuilder(null)
    val bw = wb.build().toBatch
    val e = intercept[IllegalStateException] {
      bw.commit(Array.empty)
    }
    assert(e.getMessage.contains("concurrent commit"), e.getMessage)
    // and the table still carries the racing commit's rows, untouched
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) == 110L)
  }

  test("stats skip the per-row scan in the metadata DELETE path") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(0, 100)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, 1.0 FROM range(100, 200)")
    val dir = root.resolve("t")
    val before = GraftCatalog.currentManifest(dir).map(_.file).toSet
    spark.sql(s"DELETE FROM $cat.t WHERE id >= 190")
    val after = GraftCatalog.currentManifest(dir).map(_.file).toSet
    // the sub-190 files carried by reference (stats or scan — either
    // way, by NAME); at least the first commit's files must survive
    assert(before.intersect(after).nonEmpty)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) == 190L)
  }

  test("native streaming write: epochs append; a replayed epoch is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    val ckpt = graft.TempDirs.create("gstat-ckpt").toString
    val q = spark.readStream.format("graft.sources.SyntheticDocsSource")
      .option("rows", "200").option("parts", "2").option("rowsPerBatch", "50")
      .load()
      .selectExpr("id", "score AS v")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .toTable(s"$cat.t")
    q.awaitTermination(60000)
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) == 200L)
    // every committed version carries its epoch tag (exactly-once ledger)
    val dir = root.resolve("t")
    val cur = IndexStore.pointer.resolve(dir, GraftCatalog.PointerName).get
    val tag = GraftCatalog.tagOf(cur)
    assert(tag.exists(_.startsWith("epoch-")), tag.toString)
    // the replay scenario: the SAME epoch commit lands again (driver died
    // after publishing, before acking the checkpoint) — catalog no-op
    val seqBefore = GraftCatalog.seqOf(cur)
    GraftCatalog.commitVersion(dir, Nil, truncate = false, tag = tag)
    val curAfter = IndexStore.pointer.resolve(dir, GraftCatalog.PointerName).get
    assert(GraftCatalog.seqOf(curAfter) == seqBefore, "replay must not publish")
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.t").head().getLong(0) == 200L)
  }

  test("_file metadata column: user-selectable lineage, manifest-consistent") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(0, 40)")
    spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(40, 60)")
    val perFile = spark.sql(
      s"SELECT _file, count(*) AS n FROM $cat.t GROUP BY _file").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val manifest = GraftCatalog.currentManifest(root.resolve("t"))
      .map(e => (e.file, e.rows)).toMap
    assert(perFile == manifest, s"$perFile vs $manifest")
    // _file is metadata: SELECT * must NOT include it
    assert(spark.sql(s"SELECT * FROM $cat.t").schema.fieldNames.toSeq == Seq("id"))
    // ...and the name is reserved: a data column would shadow the
    // metadata column and break the COW group-filter attribute
    intercept[Exception] { spark.sql(s"CREATE TABLE $cat.bad (_file STRING)") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $cat.t ADD COLUMN _file STRING") }
  }

  test("concurrent appends serialize on the table lock; none is lost") {
    val (cat, _) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT)")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val writes = (0 until 6).map { b =>
      Future {
        spark.sql(s"INSERT INTO $cat.t SELECT id FROM range(${b * 100}, ${b * 100 + 100})")
      }
    }
    Await.result(Future.sequence(writes), 120.seconds)
    // all six commits landed: every id exactly once
    val out = spark.sql(
      s"SELECT count(*) AS n, count(DISTINCT id) AS d, CAST(sum(id) AS BIGINT) AS s FROM $cat.t").head()
    assert(out == Row(600L, 600L, 600L * 599L / 2))
  }

  test("stats round-trip the manifest codec exactly") {
    import GraftStats._
    val stats: FileStats = Map(
      "b" -> ColStats(1L, Some(false), Some(true)),
      "i" -> ColStats(0L, Some(-5), Some(17)),
      "l" -> ColStats(2L, Some(Long.MinValue), Some(Long.MaxValue)),
      "f" -> ColStats(0L, Some(-1.5f), Some(Float.NaN)),
      "d" -> ColStats(0L, Some(Double.NegativeInfinity), Some(Double.NaN)),
      "s" -> ColStats(3L, Some("héllo\tworld"), Some("z" * 64)),
      "allnull" -> ColStats(9L, None, None))
    val decoded = decode(encode(stats))
    // NaN != NaN under ==; compare through the stats order instead
    assert(decoded.keySet == stats.keySet)
    for ((k, cs) <- stats) {
      val dc = decoded(k)
      assert(dc.nulls == cs.nulls)
      assert(dc.min.isDefined == cs.min.isDefined)
      assert(dc.max.isDefined == cs.max.isDefined)
      for ((a, b) <- dc.min.zip(cs.min) ++ dc.max.zip(cs.max)) {
        val dt = a match {
          case _: Boolean => org.apache.spark.sql.types.BooleanType
          case _: Int => org.apache.spark.sql.types.IntegerType
          case _: Long => org.apache.spark.sql.types.LongType
          case _: Float => org.apache.spark.sql.types.FloatType
          case _: Double => org.apache.spark.sql.types.DoubleType
          case _ => org.apache.spark.sql.types.StringType
        }
        assert(GraftStats.cmp(dt, a, b) == 0, s"$k: $a vs $b")
      }
    }
  }
}
