package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the round-7 behavioral operators on crafted tables
  * with known structure: SCD2 run collapse (change-data-capture build)
  * and the event-type transition matrix. */
class Scd2PathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("scd2Runs collapses priority runs into chained validity ranges") {
    val d = graft.TempDirs.create("graft-scd2").toString
    // customer 7: A,A,B,A by date -> 3 runs; customer 9: constant -> 1 run.
    // orders 2+3 share a date: the o_orderkey tiebreak keeps A before B.
    Seq(
      (7L, 1L, ts("1995-01-01 00:00:00"), "A"),
      (7L, 2L, ts("1995-02-01 00:00:00"), "A"),
      (7L, 3L, ts("1995-02-01 00:00:00"), "B"),
      (7L, 4L, ts("1995-04-01 00:00:00"), "A"),
      (9L, 5L, ts("1995-01-15 00:00:00"), "C"),
      (9L, 6L, ts("1995-03-15 00:00:00"), "C"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = RelationalQueries.scd2Runs(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getTimestamp(3), x.getTimestamp(4), x.getLong(5))).toSeq
    assert(r == Seq(
      (7L, 1L, "A", ts("1995-01-01 00:00:00"), ts("1995-02-01 00:00:00"), 2L),
      (7L, 2L, "B", ts("1995-02-01 00:00:00"), ts("1995-04-01 00:00:00"), 1L),
      (7L, 3L, "A", ts("1995-04-01 00:00:00"), null, 1L),
      (9L, 1L, "C", ts("1995-01-15 00:00:00"), null, 2L)))
    // SCD2 invariant: within a customer, eff_to chains to the next run's
    // eff_from and only the LAST run is open-ended
    r.groupBy(_._1).values.foreach { runs =>
      val sorted = runs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4)
        case _ =>
      }
      assert(sorted.init.forall(_._5 != null) && sorted.last._5 == null)
    }
  }

  test("mergeUpsert classifies keys into update/insert/keep with latest-wins values") {
    val d = graft.TempDirs.create("graft-merge").toString
    // batch keys from orders: 5 (two orders -> latest wins), 250 (insert:
    // no target row); target keys: 5 (update), 7 (keep: no batch row)
    Seq(
      (5L, 1L, ts("1995-01-01 00:00:00"), "OLD"),
      (5L, 2L, ts("1995-06-01 00:00:00"), "NEW"),
      (250L, 3L, ts("1995-03-01 00:00:00"), "X"))
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((5L, "SEG_A"), (7L, "SEG_B"))
      .toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$d/customer.parquet")
    val r = RelationalQueries.mergeUpsert(spark, d).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2))).toSeq
    assert(r == Seq(
      (5L, "update", "PRIO:NEW"), // latest order (June) wins over January
      (7L, "keep", "SEG_B"),
      (250L, "insert", "PRIO:X")))
  }

  test("paths counts time-ordered event-type transitions per user") {
    val d = graft.TempDirs.create("graft-paths").toString
    // user 1: a->b->a (transitions ab, ba); user 2: b->a (ba).
    // events 10+11 share a timestamp: event_id breaks the tie (a first).
    Seq(
      (10L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (11L, ts("2024-01-01 00:00:00"), 1L, "b"),
      (12L, ts("2024-01-01 00:02:00"), 1L, "a"),
      (13L, ts("2024-01-01 00:00:00"), 2L, "b"),
      (14L, ts("2024-01-01 00:01:00"), 2L, "a"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = EventQueries.paths(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    assert(r == Seq(("b", "a", 2L), ("a", "b", 1L)))
  }

  test("scd2AsOf: at most one covering run per key, each nested in the build's history") {
    val sf = "/root/testdata/sf0.001"
    // o_orderdate ships as TIMESTAMP_NTZ in the fixture -> LocalDateTime
    val asOf = java.time.LocalDate
      .parse(RelationalQueries.Scd2AsOfDate).atStartOfDay()
    def ldt(r: org.apache.spark.sql.Row, i: Int) =
      Option(r.getAs[java.time.LocalDateTime](i))
    val reads = RelationalQueries.scd2AsOf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), ldt(r, 2).get, ldt(r, 3))).toSeq
    assert(reads.nonEmpty)
    // uniqueness: the validity chain admits exactly one covering run
    assert(reads.map(_._1).distinct.length == reads.length)
    // every read row IS a build row whose range covers the as-of date
    val histRows = RelationalQueries.scd2Runs(spark, sf).collect()
    val hist = histRows
      .map(r => (r.getLong(0), r.getString(2), ldt(r, 3).get, ldt(r, 4))).toSet
    assert(reads.forall(hist.contains))
    assert(reads.forall { case (_, _, from, to) =>
      !from.isAfter(asOf) && to.forall(_.isAfter(asOf)) })
    // keys born after the as-of date are absent
    val bornLater = histRows
      .filter(_.getLong(1) == 1L) // run_id 1 = the key's birth
      .filter(r => ldt(r, 3).get.isAfter(asOf)).map(_.getLong(0)).toSet
    assert(reads.map(_._1).toSet.intersect(bornLater).isEmpty)
  }
}
