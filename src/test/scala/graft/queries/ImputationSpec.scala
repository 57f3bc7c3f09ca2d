package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LOCF fill (rel_locf_fill) and the dyadic EWMA (ev_ewma) on inputs
  * with closed-form answers. */
class ImputationSpec extends SparkSpec {

  test("LOCF carries the last observation forward and invents nothing") {
    import spark.implicits._
    // cust 100 (passes the %100 sample): O, F(10), O, F(20), O
    // -> filled: null, 10, 10, 20, 20
    val rows = Seq(
      (100L, "2024-01-01", 1L, "O", 99.0),
      (100L, "2024-01-02", 2L, "F", 10.0),
      (100L, "2024-01-03", 3L, "O", 99.0),
      (100L, "2024-01-04", 4L, "F", 20.0),
      (100L, "2024-01-05", 5L, "O", 99.0))
    val dir = graft.TempDirs.create("graft-locf-spec").toString
    rows.toDF("o_custkey", "d", "o_orderkey", "o_orderstatus", "o_totalprice")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("d").cast("timestamp").as("o_orderdate"),
        lit("1-URGENT").as("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = RelationalQueries.locfFill(spark, dir).collect()
      .map(r => (r.getLong(2), Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, None), (2L, Some(10.0)), (3L, Some(10.0)),
      (4L, Some(20.0)), (5L, Some(20.0))))
  }

  test("IQR fence classifies a closed-form spike; no low outliers") {
    import spark.implicits._
    // values 1..8 plus a 100-spike: n=9, exact ranks ceil(9*25/100)=3
    // -> q1=3, ceil(9*75/100)=7 -> q3=7, IQR=4; high fence v > 13
    // catches only the spike, low fence v < -3 catches nothing.
    val rows = (1 to 8).map(_.toDouble) :+ 100.0
    val dir = graft.TempDirs.create("graft-iqr-spec").toString
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("event_id", "value")
      .select(col("event_id"), lit("2024-01-01 10:00:00").cast("timestamp").as("ts"),
        col("event_id").as("user_id"), lit("view").as("event_type"),
        col("value"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.outlierIqr(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)))
    assert(got.toSeq == Seq((3L, 7L, 4L, 9L, 0L, 1L)))
  }

  test("EWMA of a constant series is the constant; history gate holds") {
    import spark.implicits._
    // 12 hours of exactly 5 events each: rows only after 8 full hours,
    // and each EWMA is exactly 5.0 (the weights sum to the normalizer).
    val rows = for (h <- 0 until 12; i <- 0 until 5) yield
      (h.toLong * 5 + i, f"2024-01-01 $h%02d:30:00", h.toLong, "view", 1.0, "{}")
    val dir = graft.TempDirs.create("graft-ewma-spec").toString
    rows.toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventQueries.ewma(spark, dir).collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(got.length == 12 - EventQueries.EwmaDepth + 1)
    assert(got.forall { case (cnt, e) => cnt == 5L && e == 5.0 })
  }
}
