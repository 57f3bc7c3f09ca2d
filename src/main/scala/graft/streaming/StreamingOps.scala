package graft.streaming

import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Structured Streaming equivalents of the reference's streaming surface
  * (SURVEY.md §2.1 S2/S3, §2.5 A6, §2.6 O5, K2): file-stream source with a
  * statically-bootstrapped schema, complete-mode stateful aggregation, and
  * — the 100 TB fix the reference lacks (§7.4 risk 3) — watermarked
  * event-time windows whose state is bounded.
  *
  * The verified queries below actually execute through MicroBatchExecution
  * into a memory sink (complete mode over a finite source ≡ the batch
  * aggregate, which is exactly the DuckDB oracle).
  */
object StreamingOps {

  private def runToMemory(spark: SparkSession, streamed: DataFrame): String = {
    val name = "graft_mem_" + UUID.randomUUID().toString.replace("-", "")
    val q = streamed.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    name
  }

  /** Static-then-stream schema bootstrap (reference S3, q2:95-97). The
    * nanosecond-timestamp normalization (Tables.normalizeEvents) applies on
    * top of the streaming source exactly as it does on the batch scan. */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the file-stream source tails a *directory* (reference S2 semantics);
    // the glob filter selects the events table out of the fixture dir
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    Tables.normalizeEvents(stream)
  }

  /** Complete-mode grouped count over the event stream (A6 parity: state
    * retained, full result re-emitted per micro-batch). */
  def completeCounts(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val agg = eventStream(spark, dir)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    val table = runToMemory(spark, agg)
    spark.table(table).orderBy("event_type")
  }

  /** Watermarked tumbling 1-hour window aggregation over the event stream.
    * Complete output here (finite source, oracle-checkable); the
    * append-mode bounded-state variant is exercised in the test suite. */
  def hourlyCounts(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
    val table = runToMemory(spark, agg)
    spark.table(table)
      .select(col("window.start").as("hr"), col("event_type"), col("cnt"), col("sum_val"))
      .orderBy("hr", "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_complete_counts" -> (completeCounts _),
    "stream_hourly_counts" -> (hourlyCounts _))

  val oracles: Map[String, String] = Map(
    "stream_complete_counts" ->
      """SELECT event_type, count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "stream_hourly_counts" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)
}
