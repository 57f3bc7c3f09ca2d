package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  * Parquet + vectorized reader is the columnar upgrade over the reference's
  * row-at-a-time JSON scans (SURVEY.md §1.4) — WHAT is unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects outright
    * (PARQUET_TYPE_ILLEGAL). We read nanos as raw long via the legacy conf
    * and truncate to microsecond timestamps — exactly what engines with
    * micro precision (DuckDB included) do on the same file, so oracle
    * comparisons agree. */
  def normalizeEvents(df: DataFrame): DataFrame =
    if (df.schema.fieldNames.contains("ts") && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(spark.read.parquet(s"$dir/$name.parquet"))
  }
}
