package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scan-efficiency contracts: a 100 TB query must touch only the
  * partitions and columns it needs. Asserted on the physical plan, not
  * assumed. */
class ScanPruningSpec extends SparkSpec {

  test("partition-layout write + filter prunes to one partition at plan time") {
    val out = Files.createTempDirectory("graft-part").toString
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)

    val q = spark.read.parquet(out)
      .filter(col("event_type") === "error")
      .agg(count(lit(1)).as("cnt"))
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"),
      s"expected partition filter in scan:\n$scan")
    // pruned read returns the same count as the unpruned filter
    val expected = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "error").count()
    assert(q.head().getLong(0) == expected)
    // and the scan's data filters list must NOT carry the partition
    // predicate as a row-level filter (it is resolved at file-listing time)
    val filesRead = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(filesRead.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition predicate must prune at listing time:\n$filesRead")
  }

  test("projection prunes the parquet ReadSchema to the referenced columns") {
    val q = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"expected 2-column ReadSchema:\n$scan")
  }
}
