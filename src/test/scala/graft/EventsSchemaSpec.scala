package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The testdata generator has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS) (pre-round-8) and as timestamp[us] with no timezone
  * annotation (round 8 — Spark reads it as TIMESTAMP_NTZ, which broke 12
  * event-time queries at analysis). This spec turns the next type drift
  * into a named failure instead of a dozen opaque query errors: whatever
  * physical type the generator emits, [[Tables.normalizeEvents]] must hand
  * every event-time operator a session-zoned TimestampType.
  */
class EventsSchemaSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(s"$d/events.parquet").exists())

  test("driver testdata dirs are present") {
    assert(sfDirs.nonEmpty, "no /root/testdata/sf*/events.parquet found")
  }

  for (dir <- sfDirs)
    test(s"events.ts normalizes to TimestampType at $dir") {
      val events = Tables(spark, dir, "events")
      assert(events.schema("ts").dataType == TimestampType,
        s"post-normalization ts must be TIMESTAMP_LTZ, got ${events.schema("ts").dataType}")
      // and the event-time entry points the 12 broken queries died on:
      val n = events.selectExpr("unix_micros(ts)").limit(1).count()
      assert(n == 1)
    }

  test("normalizeEvents handles the NTZ generation (synthetic)") {
    import spark.implicits._
    val ntz = Seq("2026-08-13T12:00:00").toDF("s")
      .selectExpr("CAST(s AS TIMESTAMP_NTZ) AS ts", "1 AS user_id")
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fixed = Tables.normalizeEvents(ntz)
    assert(fixed.schema("ts").dataType == TimestampType)
    // session tz is UTC, so the cast is value-preserving wall-clock → epoch
    assert(fixed.selectExpr("unix_micros(ts)").head().getLong(0) ==
      1786622400000000L)
  }

  test("normalizeEvents handles the legacy nanos-as-long generation (synthetic)") {
    import spark.implicits._
    val nanos = Seq(1786622400000000000L).toDF("ts")
    val fixed = Tables.normalizeEvents(nanos)
    assert(fixed.schema("ts").dataType == TimestampType)
    assert(fixed.selectExpr("unix_micros(ts)").head().getLong(0) ==
      1786622400000000L)
  }

  test("normalizeEvents is a no-op on already-LTZ and ts-less frames") {
    import spark.implicits._
    val ltz = Seq("2026-08-13 12:00:00").toDF("s")
      .selectExpr("CAST(s AS TIMESTAMP) AS ts")
    assert(Tables.normalizeEvents(ltz).schema("ts").dataType == TimestampType)
    val noTs = Seq(1).toDF("x")
    assert(Tables.normalizeEvents(noTs).schema == noTs.schema)
  }
}
