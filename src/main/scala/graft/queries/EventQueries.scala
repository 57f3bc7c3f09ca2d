package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** Event-table queries: semi-structured JSON prop extraction (the fixture
  * analog of the reference's nested-JSON path access, SURVEY.md §1.2) and
  * event-time bucketed aggregation (the batch shape of the streaming
  * windows in graft.streaming).
  */
object EventQueries {

  /** Nested-prop extraction via regexp (engine-portable; the library also
    * offers from_json, exercised in tests). One scan, one shuffle. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    Tables(spark, dir, "events")
      .filter(col("props").contains("\"k\""))
      .withColumn("k",
        regexp_extract(col("props"), """"k":\s*(\d+)""", 1).cast("long"))
      .filter(col("k").isNotNull)  // NULL sorts first in Spark, last in DuckDB
      .groupBy("k")
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .orderBy("k")
  }

  /** Tumbling 1-hour event-time buckets — batch twin of
    * graft.streaming.StreamingOps.hourlyCounts. */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    Tables(spark, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_val"))
      .orderBy("hr", "event_type")
  }

  /** JSON-path prop extraction via get_json_object (the JSON-function
    * analog of the regexp path above; FIXTURES.md §C role map). */
  def jsonPath(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    Tables(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .filter(col("k").isNotNull)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_json_extract" -> (jsonExtract _),
    "ev_json_path" -> (jsonPath _),
    "ev_hourly_agg" -> (hourlyAgg _))

  val oracles: Map[String, String] = Map(
    "ev_json_extract" ->
      """SELECT k, count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM (
        |  SELECT TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT) AS k, value
        |  FROM events WHERE contains(props, '"k"'))
        |WHERE k IS NOT NULL
        |GROUP BY k ORDER BY k""".stripMargin,
    "ev_json_path" ->
      """SELECT k, count(*) AS cnt FROM (
        |  SELECT TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |WHERE k IS NOT NULL GROUP BY k ORDER BY k""".stripMargin,
    "ev_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hr, event_type,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_val
        |FROM events GROUP BY 1, 2 ORDER BY hr, event_type""".stripMargin)
}
