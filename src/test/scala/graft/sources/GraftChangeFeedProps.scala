package graft.sources

import java.nio.file.Path

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property fuzz over the WHOLE change-feed surface: random lifecycles
  * mixing every mutating verb (append, overwrite, COW update, MERGE,
  * delete — copy-on-write AND deletion-vector mode — and compaction)
  * must satisfy the feed's apply invariant at every probed version:
  * replaying the retract feed from empty reconstructs the snapshot
  * `VERSION AS OF k` exactly, and the minimal net feed applies to the
  * same state. One violated multiset anywhere — a lost retraction, a
  * resurrected masked row, a mislabeled image, a leaked compaction —
  * fails the seed with its op script printed. */
class GraftChangeFeedProps extends SparkSpec {

  private def applied(feed: DataFrame): DataFrame = {
    val typ = col(GraftChangeFeed.ChangeTypeCol)
    feed.where(typ.isin("insert", "update_postimage")).select("id", "v")
      .exceptAll(
        feed.where(typ.isin("delete", "update_preimage")).select("id", "v"))
  }

  test("retract apply == snapshot at every probed version (12 random lifecycles)") {
    for (seed <- 1 to 12) {
      val rnd = new scala.util.Random(seed)
      val cat = s"cfp$seed"
      val root = graft.TempDirs.create("cfeed-props")
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
      val dvMode = seed % 2 == 0
      val props =
        if (dvMode) " TBLPROPERTIES ('graft.delete.mode' = 'dv')" else ""
      spark.sql(s"CREATE TABLE $cat.t (id BIGINT, v BIGINT)$props")
      val dir = root.resolve("t")
      val script = scala.collection.mutable.ArrayBuffer.empty[String]
      def run(sql: String): Unit = { script += sql; spark.sql(sql); () }
      def span(): (Long, Long) = {
        val a = rnd.nextInt(300).toLong
        (a, a + 30L + rnd.nextInt(120))
      }
      // always start with content so later verbs have something to chew
      run(s"INSERT INTO $cat.t SELECT id, id * $seed FROM range(0, 300)")
      val nOps = 5 + rnd.nextInt(3)
      for (_ <- 0 until nOps) rnd.nextInt(6) match {
        case 0 =>
          val (a, b) = span()
          run(s"INSERT INTO $cat.t SELECT id, id + $seed FROM range($a, $b)")
        case 1 =>
          val (a, b) = span()
          run(s"INSERT OVERWRITE TABLE $cat.t SELECT id, id FROM range($a, $b)")
        case 2 =>
          val (a, b) = span()
          run(s"UPDATE $cat.t SET v = v + 7 WHERE id >= $a AND id < $b")
        case 3 =>
          val (a, b) = span()
          run(s"""MERGE INTO $cat.t t
            USING (SELECT id, id * 2 AS v FROM range($a, $b)) s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v
            WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""")
        case 4 =>
          val (a, b) = span()
          run(s"DELETE FROM $cat.t WHERE id >= $a AND id < $b")
        case 5 =>
          script += "-- compact"
          GraftCatalog.compact(dir)
          ()
      }
      val cur = GraftChangeFeed.currentSeq(dir)
      // probe the final version plus two random interior ones
      val probes = (Seq(cur) ++ Seq.fill(2)(1L + rnd.nextInt(cur.toInt)))
        .distinct
      for (k <- probes) {
        val feed = spark.read.format("graft.sources.GraftChangeFeed")
          .option("table", dir.toString)
          .option("fromSeq", "0").option("toSeq", k.toString).load()
        val mirror = applied(feed)
        val snap = spark.sql(s"SELECT id, v FROM $cat.t VERSION AS OF '$k'")
        val extra = mirror.exceptAll(snap).count()
        val missing = snap.exceptAll(mirror).count()
        assert(extra == 0L && missing == 0L,
          s"seed=$seed dv=$dvMode version=$k diverged " +
            s"(+$extra/-$missing)\n${script.mkString("\n")}")
      }
      // the minimal net feed applies to the same final state
      val netMirror = applied(
        GraftChangeFeed.net(spark, dir.toString, 0L, cur))
      val now = spark.sql(s"SELECT id, v FROM $cat.t")
      assert(netMirror.exceptAll(now).isEmpty && now.exceptAll(netMirror).isEmpty,
        s"seed=$seed net feed diverged\n${script.mkString("\n")}")
      spark.sql(s"DROP TABLE $cat.t")
    }
  }
}
