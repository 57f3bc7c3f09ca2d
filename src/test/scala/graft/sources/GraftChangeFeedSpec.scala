package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The CHANGE DATA FEED ([[GraftChangeFeed]]): commit-kind stamping on
  * every commit path, retract-form exactness (applying the feed
  * reconstructs every version), minimal net changes with update pre/post
  * images, data-change-false compaction, legacy-commit guard rails, and
  * the retention-window loudness contract. */
class GraftChangeFeedSpec extends SparkSpec {

  private var n = 0
  private def freshCatalog(): (String, Path) = {
    n += 1
    val cat = s"cfspec$n"
    val root = graft.TempDirs.create("cfeed-spec")
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    (cat, root)
  }

  private def rawFeed(dir: Path, from: Long, to: Long): DataFrame =
    spark.read.format("graft.sources.GraftChangeFeed")
      .option("table", dir.toString)
      .option("fromSeq", from.toString).option("toSeq", to.toString)
      .load()

  private def applied(feed: DataFrame, cols: Seq[String]): DataFrame = {
    val typ = col(GraftChangeFeed.ChangeTypeCol)
    feed.where(typ.isin("insert", "update_postimage"))
      .select(cols.map(col): _*)
      .exceptAll(feed.where(typ.isin("delete", "update_preimage"))
        .select(cols.map(col): _*))
  }

  private def kindsOf(dir: Path): Seq[String] =
    GraftCatalog.describeHistory(dir).sortBy(_.seq).flatMap(_.kind)

  test("every commit path stamps its kind on the version") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.k (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.k SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    spark.sql(s"INSERT OVERWRITE TABLE $cat.k SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)")
    spark.sql(s"UPDATE $cat.k SET v = v + 1.0 WHERE id < 10")
    spark.sql(s"""MERGE INTO $cat.k t USING (SELECT id, CAST(id AS DOUBLE) AS v
      FROM range(90, 110)) s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET v = s.v
      WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
    spark.sql(s"DELETE FROM $cat.k WHERE id >= 105")
    GraftCatalog.compact(root.resolve("k"))
    assert(kindsOf(root.resolve("k")) == Seq(
      GraftCatalog.Kind.Append, GraftCatalog.Kind.Truncate,
      GraftCatalog.Kind.Update, GraftCatalog.Kind.Merge,
      GraftCatalog.Kind.Delete, GraftCatalog.Kind.Compact))
  }

  test("applying the retract feed reconstructs every committed version") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.r (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.r SELECT id, CAST(id AS DOUBLE) FROM range(0, 200)") // 1
    spark.sql(s"UPDATE $cat.r SET v = v * 2.0 WHERE id % 7 = 0") // 2
    spark.sql(s"DELETE FROM $cat.r WHERE id % 5 = 0") // 3
    spark.sql(s"INSERT INTO $cat.r SELECT id, CAST(-id AS DOUBLE) FROM range(200, 250)") // 4
    spark.sql(s"INSERT OVERWRITE TABLE $cat.r SELECT id, CAST(0.5 AS DOUBLE) FROM range(0, 30)") // 5
    for (k <- 1L to 5L) {
      val mirror = applied(rawFeed(root.resolve("r"), 0L, k), Seq("id", "v"))
      val snapshot = spark.sql(s"SELECT id, v FROM $cat.r VERSION AS OF '$k'")
      assert(mirror.exceptAll(snapshot).isEmpty &&
        snapshot.exceptAll(mirror).isEmpty,
        s"retract apply diverges from snapshot at version $k")
    }
  }

  test("net() is minimal: exact pre/post pairs, carried rows cancel") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.m (id BIGINT, grp BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.m SELECT id, id % 4, CAST(id AS DOUBLE) FROM range(0, 400)")
    spark.sql(s"UPDATE $cat.m SET v = v + 0.5 WHERE grp = 2") // rewrites every file
    val net = GraftChangeFeed.net(spark, root.resolve("m").toString, 1L, 2L)
      .collect()
    // exactly the 100 matched rows, each as one preimage + one postimage
    assert(net.length == 200)
    val byType = net.groupBy(_.getAs[String](GraftChangeFeed.ChangeTypeCol))
      .view.mapValues(_.length).toMap
    assert(byType == Map("update_preimage" -> 100, "update_postimage" -> 100))
    assert(net.forall(_.getAs[Long]("grp") == 2L))
    // pre carries the old value, post the new, for the same ids
    val pre = net.filter(_.getAs[String](GraftChangeFeed.ChangeTypeCol) == "update_preimage")
    assert(pre.forall(r => r.getAs[Double]("v") == r.getAs[Long]("id").toDouble))
    val post = net.filter(_.getAs[String](GraftChangeFeed.ChangeTypeCol) == "update_postimage")
    assert(post.forall(r => r.getAs[Double]("v") == r.getAs[Long]("id").toDouble + 0.5))
  }

  test("compaction is invisible; an identity rewrite nets to zero") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.c (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.c SELECT id FROM range(0, 300)")
    val dir = root.resolve("c")
    GraftCatalog.compact(dir) // seq 2, data-change-false
    assert(rawFeed(dir, 1L, 2L).isEmpty,
      "OPTIMIZE must contribute no change rows at all")
    // an INSERT OVERWRITE of identical content is a TRUNCATE commit: the
    // raw retract feed carries full cancelling pairs, the net feed nothing
    spark.sql(s"INSERT OVERWRITE TABLE $cat.c SELECT id FROM range(0, 300)") // 3
    assert(rawFeed(dir, 2L, 3L).count() == 600L)
    assert(GraftChangeFeed.net(spark, dir.toString, 2L, 3L).isEmpty)
  }

  test("a legacy commit without a kind marker serves only pure appends") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.l (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.l SELECT id FROM range(0, 50)") // 1
    spark.sql(s"DELETE FROM $cat.l WHERE id < 10") // 2
    val dir = root.resolve("l")
    (1L to 2L).foreach { s =>
      Files.delete(GraftCatalog.findVersionBySeq(dir, s.toString).get
        .resolve(GraftCatalog.KindFile))
    }
    // the append commit's diff is unambiguous without its marker
    assert(rawFeed(dir, 0L, 1L).count() == 50L)
    // the delete commit's is not: refuse rather than mislabel
    val e = intercept[Exception] { rawFeed(dir, 1L, 2L).count() }
    assert(e.getMessage != null && e.getMessage.contains("kind marker"),
      s"unexpected failure: $e")
  }

  test("history GC'd past a reader's range fails loudly, not silently") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.g (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.g SELECT id FROM range(0, 50)") // 1
    spark.sql(s"INSERT INTO $cat.g SELECT id FROM range(50, 100)") // 2
    val dir = root.resolve("g")
    GraftCatalog.vacuum(dir, 0L) // only the current version survives
    val e = intercept[Exception] { rawFeed(dir, 0L, 2L).count() }
    assert(e.getMessage != null && e.getMessage.contains("retention"),
      s"unexpected failure: $e")
  }

  test("streaming feed: one version per trigger, compaction emits nothing") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.s (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.s SELECT id, CAST(id AS DOUBLE) FROM range(0, 100)") // 1
    spark.sql(s"UPDATE $cat.s SET v = -v WHERE id < 20") // 2
    GraftCatalog.compact(root.resolve("s")) // 3: invisible
    spark.sql(s"INSERT INTO $cat.s SELECT id, CAST(id AS DOUBLE) FROM range(100, 120)") // 4
    val feed = spark.readStream.format("graft.sources.GraftChangeFeed")
      .option("table", root.resolve("s").toString)
      .option("startingSeq", "0").load()
    val name = s"cf_stream_$n"
    val q = feed.writeStream.outputMode("append").format("memory")
      .queryName(name)
      .option("checkpointLocation",
        graft.TempDirs.create("cfeed-ckpt").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000L)
    // materialize: the memory sink's view is not re-instanceable, so a
    // self-exceptAll over it cannot deduplicate attributes
    val sunk = spark.table(name)
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(sunk.collect(): _*), sunk.schema)
    // per-trigger batches: 4 admitted seqs, 3 with data (compact empty)
    assert(q.recentProgress.count(_.numInputRows > 0) == 3)
    val seqs = rows.select(GraftChangeFeed.CommitSeqCol).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(seqs == Seq(1L, 2L, 4L))
    // applying the streamed feed reconstructs the final table
    val mirror = applied(rows, Seq("id", "v"))
    val now = spark.sql(s"SELECT id, v FROM $cat.s")
    assert(mirror.exceptAll(now).isEmpty && now.exceptAll(mirror).isEmpty)
    spark.catalog.dropTempView(name)
  }

  test("SQL users reach the feed via CREATE TEMPORARY VIEW ... USING") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.v (id BIGINT)")
    // one writer task (range numSlices=1) → ONE pool file, so the
    // delete's rewrite shape below is deterministic
    spark.sql(s"INSERT INTO $cat.v SELECT id FROM range(0, 25, 1, 1)") // 1
    spark.sql(s"DELETE FROM $cat.v WHERE id < 5") // 2
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY VIEW v_changes
         |USING graft.sources.GraftChangeFeed
         |OPTIONS (table '${root.resolve("v")}', fromSeq '0', toSeq '2')""".stripMargin)
    val byType = spark.sql(
      s"""SELECT ${GraftChangeFeed.ChangeTypeCol} AS t, count(*) AS n
         |FROM v_changes GROUP BY 1 ORDER BY 1""".stripMargin).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // raw retract form: 25 inserts (seq 1), then the delete commit's
    // rewritten file pairs — delete side counts 25 (the full old file),
    // insert side the 20 survivors again
    assert(byType("delete") == 25L && byType("insert") == 25L + 20L)
    spark.catalog.dropTempView("v_changes")
  }

  test("the feed's column names are reserved at DDL; a snapshot df stays pinned") {
    val (cat, root) = freshCatalog()
    // a data column named like a feed column would silently receive the
    // feed's tag/seq/ts — refused at CREATE and at ALTER
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $cat.bad (id BIGINT, `_commit_seq` BIGINT)")
    }
    spark.sql(s"CREATE TABLE $cat.p (id BIGINT)")
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $cat.p ADD COLUMN `_change_type` STRING")
    }
    // a feed DataFrame without toSeq pins "current" AT SCAN BUILD: a
    // commit landing between two actions must not change its contents
    spark.sql(s"INSERT INTO $cat.p SELECT id FROM range(0, 30)")
    val df = spark.read.format("graft.sources.GraftChangeFeed")
      .option("table", root.resolve("p").toString).option("fromSeq", "0")
      .load()
    val first = df.count()
    spark.sql(s"INSERT INTO $cat.p SELECT id FROM range(30, 60)")
    assert(df.count() == first && first == 30L,
      "two actions over one snapshot feed must agree")
  }

  test("a restarted CDC stream resumes from its checkpoint: no replay, no skip") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.rs (id BIGINT, v DOUBLE)")
    spark.sql(s"INSERT INTO $cat.rs SELECT id, CAST(id AS DOUBLE) FROM range(0, 80)") // 1
    spark.sql(s"UPDATE $cat.rs SET v = -v WHERE id < 10") // 2
    // a FILE sink: the memory sink refuses checkpoint recovery, and the
    // restart contract is exactly what this test is about
    val ckpt = graft.TempDirs.create("cfeed-restart").toString
    val out = graft.TempDirs.create("cfeed-restart-out").toString
    def drain(): Unit = {
      val q = spark.readStream.format("graft.sources.GraftChangeFeed")
        .option("table", root.resolve("rs").toString)
        .option("startingSeq", "0").load()
        .writeStream.outputMode("append").format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000L)
      ()
    }
    drain()
    val seqs1 = spark.read.parquet(out)
      .select(GraftChangeFeed.CommitSeqCol).distinct()
      .collect().map(_.getLong(0)).toSet
    assert(seqs1 == Set(1L, 2L), s"run1 saw $seqs1")
    // more history lands while the stream is down
    spark.sql(s"DELETE FROM $cat.rs WHERE id >= 70") // 3
    spark.sql(s"INSERT INTO $cat.rs SELECT id, CAST(0.5 AS DOUBLE) FROM range(100, 120)") // 4
    drain()
    val all = spark.read.parquet(out)
    // the checkpoint hands the second run EXACTLY the missed commits:
    // each seq appears once across both runs, none replayed, none lost
    val perSeq = all.groupBy(GraftChangeFeed.CommitSeqCol).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSeq.keySet == Set(1L, 2L, 3L, 4L), s"saw ${perSeq.keySet}")
    assert(perSeq(1L) == 80L && perSeq(4L) == 20L,
      s"replayed or lost rows: $perSeq")
    // and the whole feed applies to the final table state
    val mirror = applied(all, Seq("id", "v"))
    val now = spark.sql(s"SELECT id, v FROM $cat.rs")
    assert(mirror.exceptAll(now).isEmpty && now.exceptAll(mirror).isEmpty)
  }

  test("schema evolution: pre-ALTER files' preimages null-fill the tail") {
    val (cat, root) = freshCatalog()
    spark.sql(s"CREATE TABLE $cat.e (id BIGINT)")
    spark.sql(s"INSERT INTO $cat.e SELECT id FROM range(0, 40)") // 1
    spark.sql(s"ALTER TABLE $cat.e ADD COLUMN v DOUBLE")
    spark.sql(s"DELETE FROM $cat.e WHERE id < 5") // 2: rewrites old files
    // net form: the rewritten files' carried rows cancel, leaving exactly
    // the five deleted rows' preimages
    val dels = GraftChangeFeed.net(spark, root.resolve("e").toString, 1L, 2L)
      .collect()
    assert(dels.length == 5 &&
      dels.forall(_.getAs[String](GraftChangeFeed.ChangeTypeCol) == "delete") &&
      dels.forall(_.isNullAt(1)),
      "old-era preimages must null-fill the evolved column")
  }
}
