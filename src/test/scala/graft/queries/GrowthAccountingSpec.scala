package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Growth-accounting semantics on a synthetic history that exercises all
  * four classes — the driver fixture's users are active every week, so
  * resurrection never fires there; this pins the full state machine. */
class GrowthAccountingSpec extends SparkSpec {

  test("new/retained/resurrected/churned classify and censor correctly") {
    import spark.implicits._
    // Weeks (Mondays): wk1=2024-01-01, wk2=01-08, wk3=01-15.
    // u1: wk1,wk2  -> new@1, retained@2, churned@3
    // u2: wk1,wk3  -> new@1, churned@2, resurrected@3
    // u3: wk3      -> new@3; churn after wk3 censored (horizon)
    val rows = Seq(
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-09 10:00:00"),
      (2L, "2024-01-03 11:00:00"), (2L, "2024-01-16 11:00:00"),
      (3L, "2024-01-17 12:00:00"))
    val dir = graft.TempDirs.create("graft-growth-spec").toString
    rows.toDF("user_id", "s")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"),
        monotonically_increasing_id().as("event_id"),
        lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.growthAccounting(spark, dir)
      .collect().map(r => (r.getDate(0).toString,
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      ("2024-01-01", 2L, 0L, 0L, 0L),
      ("2024-01-08", 0L, 1L, 0L, 1L),
      ("2024-01-15", 1L, 0L, 1L, 1L)))
  }
}
