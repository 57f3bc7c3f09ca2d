package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom plane-sweep interval join must agree row-for-row with the
  * built-in equi-join + overlap-filter composition it replaces, plan the
  * custom exec, and hold the sweep's edge cases (shrinking left ends,
  * boundary ties, null bounds/keys). The registered `ev_interval_join`
  * is additionally gated against DuckDB's IEJoin by the driver. */
class IntervalJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("agrees with the equi-join + overlap-filter composition on real windows") {
    val got = graft.queries.EventQueries.intervalOverlap(spark, sf)
    val w = graft.queries.EventQueries.ImpactWindowUs
    def windows(etype: String, p: String) =
      graft.Tables(spark, sf, "events")
        .filter(col("event_type") === etype)
        .select(col("user_id").as(s"${p}user"), col("event_id").as(s"${p}id"),
          unix_micros(col("ts")).as(s"${p}start"),
          (unix_micros(col("ts")) + w).as(s"${p}end"))
    val c = windows("click", "c_")
    val e = windows("error", "e_")
    val expected = c.join(e,
        c("c_user") === e("e_user") &&
          e("e_start") <= c("c_end") && e("e_end") >= c("c_start"))
      .select(col("c_user").as("user_id"),
        col("c_id").as("click_id"), col("e_id").as("error_id"),
        (least(col("c_end"), col("e_end")) -
          greatest(col("c_start"), col("e_start"))).as("overlap_us"))
      .orderBy("user_id", "click_id", "error_id")
    val a = got.collect().toSeq
    val b = expected.collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("plans the custom exec, not a join fallback") {
    val df = graft.queries.EventQueries.intervalOverlap(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  private def pairs(l: Seq[(java.lang.Long, Long, java.lang.Long, java.lang.Long)],
      r: Seq[(java.lang.Long, Long, java.lang.Long, java.lang.Long)]): Seq[(Long, Long)] = {
    import spark.implicits._
    val ld = l.toDF("k", "lid", "ls", "le")
    val rd = r.toDF("rk", "rid", "rs", "re")
    Interval.join(ld, rd, Seq("k" -> "rk"), ("ls", "le"), ("rs", "re"))
      .select("lid", "rid").orderBy("lid", "rid")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toSeq
  }

  test("sweep edge cases: shrinking left end, boundary ties, disjoint") {
    val out = pairs(
      l = Seq(
        (1L, 10L, 0L, 100L),   // admits r20 [50,60]
        (1L, 11L, 5L, 10L),    // r20 stays ACTIVE but out-starts this left
        (1L, 12L, 55L, 70L),   // overlaps r20 again
        (1L, 13L, 60L, 200L),  // touches r20's end exactly (closed) + r21
        (1L, 14L, 301L, 400L)  // strictly after r21 [200,300] -> nothing
      ).map(t => (java.lang.Long.valueOf(t._1), t._2,
        java.lang.Long.valueOf(t._3), java.lang.Long.valueOf(t._4))),
      r = Seq(
        (1L, 20L, 50L, 60L),
        (1L, 21L, 200L, 300L)
      ).map(t => (java.lang.Long.valueOf(t._1), t._2,
        java.lang.Long.valueOf(t._3), java.lang.Long.valueOf(t._4))))
    assert(out == Seq((10L, 20L), (12L, 20L), (13L, 20L), (13L, 21L)))
  }

  test("null keys and null bounds never match") {
    val out = pairs(
      l = Seq(
        (null, 10L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
        (java.lang.Long.valueOf(1L), 11L, null, java.lang.Long.valueOf(100L)),
        (java.lang.Long.valueOf(1L), 12L, java.lang.Long.valueOf(0L), null),
        (java.lang.Long.valueOf(1L), 13L, java.lang.Long.valueOf(0L),
          java.lang.Long.valueOf(100L))),
      r = Seq(
        (null, 20L, java.lang.Long.valueOf(0L), java.lang.Long.valueOf(100L)),
        (java.lang.Long.valueOf(1L), 21L, null, java.lang.Long.valueOf(100L)),
        (java.lang.Long.valueOf(1L), 22L, java.lang.Long.valueOf(0L), null),
        (java.lang.Long.valueOf(1L), 23L, java.lang.Long.valueOf(40L),
          java.lang.Long.valueOf(140L))))
    assert(out == Seq((13L, 23L)))
  }

  test("SQLMetrics: output rows and peak active") {
    val c = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        unix_micros(col("ts")).as("c_s"),
        (unix_micros(col("ts")) + 3600000000L).as("c_e"))
    val e = graft.Tables(spark, sf, "events")
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
        unix_micros(col("ts")).as("e_s"),
        (unix_micros(col("ts")) + 3600000000L).as("e_e"))
    val df = Interval.join(c, e, Seq("c_user" -> "e_user"), ("c_s", "c_e"), ("e_s", "e_e"))
    val n = df.count()
    val df2 = Interval.join(c, e, Seq("c_user" -> "e_user"), ("c_s", "c_e"), ("e_s", "e_e"))
    val rows = df2.collect()
    val exec = allNodes(df2.queryExecution.executedPlan)
      .collectFirst { case x: IntervalJoinExec => x }.get
    assert(rows.length.toLong == n && n > 0)
    assert(exec.metrics("numOutputRows").value == n)
    assert(exec.metrics("peakActive").value >= 1)
  }
}
