package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Closed-form contracts of the calendar spine and the streak islands. */
class CalendarStreakSpec extends SparkSpec {

  test("streak islands split exactly at day gaps") {
    import spark.implicits._
    // user 1 active on days 1,2,3 / 5 / 10,11 -> streaks 3,1,2
    val days = Seq(1, 2, 3, 5, 10, 11).map(d => f"2024-01-$d%02d 09:00:00")
    val dir = graft.TempDirs.create("graft-streak-spec").toString
    days.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("event_id", "s")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        lit(1L).as("user_id"), lit("view").as("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.activeStreak(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((1L, 6L, 3L, 3L)))
  }

  test("calendar spine covers the range with ISO weeks at the year seam") {
    import spark.implicits._
    // 1995-01-01 is a Sunday in ISO week 52 of 1994 — the boundary case
    // a naive week(month) spelling gets wrong
    val dir = graft.TempDirs.create("graft-datedim-spec").toString
    Seq(("1995-01-01"), ("1995-01-03"))
      .toDF("d")
      .select(lit(1L).as("o_orderkey"), lit(1L).as("o_custkey"),
        lit("O").as("o_orderstatus"), lit(1.0).as("o_totalprice"),
        col("d").cast("timestamp").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = RelationalQueries.dateDim(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(got.toSeq == Seq(
      ("1995-01-01", 52, 1, 1),
      ("1995-01-02", 1, 2, 0),
      ("1995-01-03", 1, 3, 0)))
  }
}
