package graft.sources

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The partitioned-layout scan must prune at PLANNING time: the lang
  * filter has to land in the scan's PartitionFilters (directory-level
  * pruning — at 100 TB the difference between listing one language's
  * slice and scanning the corpus), and the result must equal the same
  * aggregate computed from the unpartitioned original. */
class PartitionPruningSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("partitioned scan prunes on the partition column") {
    val df = Formats.partitionedScan(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"lang filter did not reach PartitionFilters:\n$plan")
    // the data filter must NOT degrade to a post-scan row filter on lang
    // (that would mean the directory layout was ignored)
    assert(!plan.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang landed in data filters instead of partition pruning:\n$plan")
  }

  test("partitioned scan equals the unpartitioned aggregate") {
    val part = Formats.partitionedScan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val direct = Tables(spark, sf, "documents")
      .filter(col("lang") === "en")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(part == direct && part.nonEmpty)
  }
}
