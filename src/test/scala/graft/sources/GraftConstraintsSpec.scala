package graft.sources

import java.nio.file.Path

import graft.SparkSpec

/** Write-time contracts ([[GraftConstraints]]): CHECK constraints as
  * `graft.check.*` table properties enforced atomically on every commit
  * path (batch insert, COW update/merge, streaming epoch), NOT NULL off
  * the manifest null counts, SQL null-passes-CHECK semantics, existing-
  * data validation on ADD CONSTRAINT, the stats fast path, and the
  * parser's loud guard rails. */
class GraftConstraintsSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"ckspec$n"
    val root = graft.TempDirs.create("ck-spec")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def versionCount(dir: Path): Long =
    GraftCatalog.describeHistory(dir).size.toLong

  test("a violating INSERT fails atomically: no version, no rows") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, score DOUBLE)
      TBLPROPERTIES ('graft.check.score_range' = 'score >= 0.0 AND score < 100.0')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 50)")
    val dir = root.resolve("t")
    val before = versionCount(dir)
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (999, 250.0)")
    }
    assert(flatten(e).contains("score_range"), s"got: ${flatten(e)}")
    assert(versionCount(dir) == before, "failed commit must publish nothing")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 50L)
  }

  test("NULL passes CHECK; a declared NOT NULL column rejects null") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT NOT NULL, score DOUBLE)
      TBLPROPERTIES ('graft.check.pos' = 'score >= 0.0')""")
    // SQL CHECK semantics: a NULL score is not a violation
    spark.sql(s"INSERT INTO $cat.t VALUES (1, CAST(NULL AS DOUBLE))")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1L)
    // a null id is: either Spark's write-path null check or the
    // manifest-stats NOT NULL gate must refuse, and nothing lands
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (CAST(NULL AS BIGINT), 1.0)")
    }
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 1L)
  }

  test("ADD CONSTRAINT validates existing data; conforming ones stick") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.t (id BIGINT, score DOUBLE)")
    spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 50)")
    // the table holds scores up to 49: a <= 10 constraint is refused
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.check.low' = 'score <= 10.0')")
    }
    assert(flatten(e).contains("low"), s"got: ${flatten(e)}")
    assert(!GraftCatalog.readProps(root.resolve("t")).contains("graft.check.low"),
      "a refused constraint must not be recorded")
    // a conforming one sticks and enforces from then on
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.check.low' = 'score <= 100.0')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.t VALUES (7, 200.0)")
    }
    // UNSET removes enforcement
    spark.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES ('graft.check.low')")
    spark.sql(s"INSERT INTO $cat.t VALUES (7, 200.0)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head().getLong(0) == 51L)
  }

  test("re-adding a dropped constraint revalidates against current data") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, score DOUBLE)
      TBLPROPERTIES ('graft.check.cap' = 'score <= 10.0')""")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 5.0)")
    spark.sql(s"ALTER TABLE $cat.t UNSET TBLPROPERTIES ('graft.check.cap')")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 50.0)") // drifts past the cap
    val e = intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.check.cap' = 'score <= 10.0')")
    }
    assert(flatten(e).contains("cap"), s"got: ${flatten(e)}")
  }

  test("a violating UPDATE aborts the COW commit; the table is unchanged") {
    val (cat, root) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.t (id BIGINT, score DOUBLE)
      TBLPROPERTIES ('graft.check.cap' = 'score <= 100.0')""")
    spark.sql(s"INSERT INTO $cat.t SELECT id, CAST(id AS DOUBLE) FROM range(0, 50)")
    val dir = root.resolve("t")
    val before = versionCount(dir)
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.t SET score = score + 90.0 WHERE id >= 20")
    }
    assert(flatten(e).contains("cap"), s"got: ${flatten(e)}")
    assert(versionCount(dir) == before)
    val sum = spark.sql(s"SELECT CAST(sum(score) AS BIGINT) FROM $cat.t")
      .head().getLong(0)
    assert(sum == (0L until 50L).sum, "no partial update may be visible")
    // a conforming UPDATE then lands
    spark.sql(s"UPDATE $cat.t SET score = score + 10.0 WHERE id >= 20")
    assert(spark.sql(s"SELECT CAST(sum(score) AS BIGINT) FROM $cat.t")
      .head().getLong(0) == (0L until 50L).sum + 300L)
  }

  test("a violating streaming epoch fails the query; prior epochs stay") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.s (id BIGINT, bucket INT, score DOUBLE)
      TBLPROPERTIES ('graft.check.cap' = 'id < 15000')""")
    val stream = spark.readStream.format("graft.sources.SyntheticDocsSource")
      .option("rows", "20000").option("parts", "4")
      .option("rowsPerBatch", "5000").load()
    val q = stream.writeStream
      .option("checkpointLocation", graft.TempDirs.create("ck-ckpt").toString)
      .toTable(s"$cat.s")
    val e = intercept[Exception] { q.awaitTermination(120000L) }
    assert(flatten(e).contains("cap"), s"got: ${flatten(e)}")
    // epochs below the cap committed; the violating one published nothing
    val mx = spark.sql(s"SELECT max(id) AS m, count(*) AS n FROM $cat.s").head()
    assert(mx.getLong(0) < 15000L && mx.getLong(1) % 5000L == 0L,
      s"only whole conforming epochs may be visible, got $mx")
  }

  test("stats clear conforming files without a scan; only unprovable ones are read") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.f (id BIGINT, score DOUBLE)
      TBLPROPERTIES ('graft.check.pos' = 'score >= 0.0')""")
    val base = GraftConstraints.scannedFiles
    // min >= 0 proves the negation (score < 0) matches nothing: no scan
    spark.sql(s"INSERT INTO $cat.f SELECT id, CAST(id + 10 AS DOUBLE) FROM range(0, 1000)")
    assert(GraftConstraints.scannedFiles == base,
      "stats-provable files must not be re-read")
    // a <> constraint strictly inside every file's [min, max] (score
    // cycles 0..6, 3 excluded) can never be proven by bounds: scan
    spark.sql(s"ALTER TABLE $cat.f SET TBLPROPERTIES ('graft.check.ne' = 'score <> 3.0')")
    spark.sql(s"INSERT INTO $cat.f SELECT id, CAST(id % 7 AS DOUBLE) FROM range(4000, 6000) WHERE id % 7 <> 3")
    assert(GraftConstraints.scannedFiles > base,
      "an unprovable constraint must fall back to the scan")
  }

  test("parser guard rails: everything unsupported is loud at definition") {
    val (cat, _) = freshCatalog()
    def bad(props: String): Unit = {
      n += 1
      intercept[Exception] {
        spark.sql(s"CREATE TABLE $cat.bad$n (id BIGINT, b BINARY, s STRING) " +
          s"TBLPROPERTIES ($props)")
      }
      ()
    }
    bad("'graft.check.a' = 'id >= 0 OR id < 5'")
    bad("'graft.check.a' = '(id >= 0)'")
    bad("'graft.check.a' = 'nope >= 0'")
    bad("'graft.check.a' = 'id >= abc'")
    bad("'graft.check.a' = 'b = 1'") // binary: no stats order
    bad("'graft.check.a' = \"s = 'unterminated\"")
    bad("'graft.check.a' = ''")
    // identifiers containing 'and'/'or' around underscores stay names
    n += 1
    spark.sql(s"CREATE TABLE $cat.u$n (or_id BIGINT, flag_and_mask BIGINT) " +
      "TBLPROPERTIES ('graft.check.a' = 'or_id >= 0 AND flag_and_mask <= 7')")
    spark.sql(s"INSERT INTO $cat.u$n VALUES (1, 5)")
    intercept[Exception] { spark.sql(s"INSERT INTO $cat.u$n VALUES (1, 9)") }
    // string literals with AND/OR inside stay literal
    n += 1
    spark.sql(s"CREATE TABLE $cat.ok$n (s STRING) " +
      "TBLPROPERTIES ('graft.check.a' = \"s <> 'a AND or b'\")")
    spark.sql(s"INSERT INTO $cat.ok$n VALUES ('x')")
    intercept[Exception] {
      spark.sql(s"INSERT INTO $cat.ok$n VALUES ('a AND or b')")
    }
  }

  test("constraints survive SHOW TBLPROPERTIES (the stored property face)") {
    val (cat, _) = freshCatalog()
    spark.sql(s"""CREATE TABLE $cat.p (id BIGINT)
      TBLPROPERTIES ('graft.check.pos' = 'id >= 0', 'graft.note' = 'hello')""")
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.p").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("graft.check.pos").contains("id >= 0"))
    assert(props.get("graft.note").contains("hello"))
  }

  private def flatten(e: Throwable): String = {
    val sb = new StringBuilder
    var t: Throwable = e
    while (t != null) { sb.append(t.getMessage).append(" | "); t = t.getCause }
    sb.toString
  }
}
