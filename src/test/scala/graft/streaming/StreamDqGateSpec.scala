package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The driver fixture is clean, so stream_dq_gate's oracle proves only
  * the all-green ledger there; this feeds a deliberately dirty events
  * table through the SAME streaming path and pins that every counter
  * fires. */
class StreamDqGateSpec extends SparkSpec {

  test("every gate counter fires on a dirty event feed") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-dq-stream").toString
    Seq(
      (1L, "2024-01-01 10:00:00", Option(1L), "view", 5.0, """{"k": 7}"""),
      (2L, "2024-01-01 10:01:00", None, "view", 5.0, """{"k": 8}"""),     // null user
      (3L, "2024-01-01 10:02:00", Option(3L), "view", -2.0, """{"k": 9}"""), // nonpositive
      (4L, "2024-01-01 10:03:00", Option(4L), "view", 5.0, """{"j": 1}"""),  // no k
      (5L, "2024-01-01 10:04:00", Option(5L), "view", 0.0, "not json"))      // both
      .toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      // the file-stream source globs a FILE named events.parquet (the
      // fixture layout), so stage the Spark directory-write and move
      // the single part out
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_stage")
    val part = new java.io.File(s"$dir/_stage").listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .head
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/events.parquet"))
    val got = StreamingOps.streamDqGate(spark, dir).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == ((5L, 1L, 2L, 2L)))
  }
}
