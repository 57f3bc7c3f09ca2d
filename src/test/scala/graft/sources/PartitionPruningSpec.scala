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

  test("dpp join injects a dynamic-pruning subquery into the fact scan") {
    val df = Formats.dppJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the dim-side filter is invisible to static pruning; the scan must
    // carry a runtime dynamicpruning expression in its PartitionFilters
    assert(plan.contains("dynamicpruning"),
      s"no dynamic partition pruning in the fact scan:\n$plan")
    // and the results equal the degenerate static IN over the original
    val viaJoin = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val static = Tables(spark, sf, "documents")
      .filter(col("lang").isin("en", "zh"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"))
      .orderBy("lang")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaJoin == static)
  }

  test("schema evolution: merged read carries the late column as nullable nulls") {
    // trigger materialization first (idempotent), then inspect
    Formats.schemaEvolution(spark, sf).collect()
    val root = "/tmp/graft-src-evolve-_root_testdata_sf0.001"
    val df = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/b1", s"$root/b2")
    assert(df.schema.fieldNames.contains("source"))
    assert(df.schema("source").nullable)
    // pre-drift rows (even ids) read NULL source; post-drift rows keep it
    import org.apache.spark.sql.functions.col
    assert(df.filter(col("doc_id") % 2 === 0 && col("source").isNotNull).count() == 0)
    assert(df.filter(col("doc_id") % 2 === 1 && col("source").isNull).count() == 0)
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
