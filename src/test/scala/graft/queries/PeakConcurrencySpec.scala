package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sweep-line semantics on crafted sessions: overlapping sessions stack,
  * the earliest instant achieving the peak is reported, and a session
  * starting at the exact microsecond another's exclusive end fires nets
  * to zero — no phantom double-count at the boundary. */
class PeakConcurrencySpec extends SparkSpec {

  private def eventsDir(rows: Seq[(Long, Long)]): String = {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-peak-spec").toString
    rows.zipWithIndex.map { case ((u, us), i) => (i.toLong, u, us) }
      .toDF("event_id", "user_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val Base = 1704067200000000L // 2024-01-01T00:00:00Z in micros

  test("overlapping sessions stack; earliest peak instant reported") {
    // A [0,100], B [50,150], C [200,300]: conc 1,2,1,0,1,0 -> peak 2 @ 50
    val dir = eventsDir(Seq(
      (1L, Base), (1L, Base + 100),
      (2L, Base + 50), (2L, Base + 150),
      (3L, Base + 200), (3L, Base + 300)))
    val got = EventQueries.peakConcurrency(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((2L, Base + 50)))
  }

  test("a session starting at another's exclusive end does not stack") {
    // A [0,100], B [101,200]: B starts at A's end+1 instant -> net delta
    // 0 there, concurrency never exceeds 1
    val dir = eventsDir(Seq(
      (1L, Base), (1L, Base + 100),
      (2L, Base + 101), (2L, Base + 200)))
    val got = EventQueries.peakConcurrency(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, Base)))
  }
}
