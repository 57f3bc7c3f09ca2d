package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Scan-efficiency contracts: a 100 TB query must touch only the
  * partitions and columns it needs. Asserted on the physical plan, not
  * assumed. */
class ScanPruningSpec extends SparkSpec {

  test("partition-layout write + filter prunes to one partition at plan time") {
    val out = graft.TempDirs.create("graft-part").toString
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

  test("dynamic partition pruning injects a runtime partition filter from the dim side") {
    // fact partitioned on the join key; the selective dim filter is only
    // knowable at runtime — DPP must turn it into a partition filter on
    // the fact scan instead of scanning every partition
    val out = graft.TempDirs.create("graft-dpp").toString
    graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    // the dim side must NOT be constant-foldable (a literal would prune
    // STATICALLY via constant propagation — also correct, but not DPP)
    val dim = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select(col("event_type").as("d_type")).distinct()
      .filter(col("d_type").rlike("^err"))
    val q = spark.read.parquet(out)
      .join(dim, col("event_type") === col("d_type"))
      .agg(count(lit(1)).as("cnt"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the fact scan:\n$plan")
    val expected = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .filter(col("event_type") === "error").count()
    assert(q.head().getLong(0) == expected)
  }

  test("runtime bloom-filter join pruning injects on a selective fact-fact join") {
    // Spark's runtime row-group filtering: the selective side's join keys
    // feed a bloom filter applied to the big side BEFORE the shuffle —
    // the row-level analog of DPP, essential when the big side is not
    // partitioned on the join key
    val prev = (
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    // the filter only injects when the app side exceeds the size threshold
    // (fixtures are tiny: floor it) and when the join would SHUFFLE — a
    // broadcast join already ships the keys, so disable auto-broadcast to
    // model the fact-fact case the filter exists for
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .filter(col("o_totalprice") > 300000.0)  // selective creation side
        .select("o_orderkey")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("s"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter"),
        s"expected a bloom_filter runtime filter on the fact side:\n$optimized")
      // the filter is a pure pruning optimization: result unchanged
      val expected = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .join(spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .filter(col("o_totalprice") > 300000.0),
          col("l_orderkey") === col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("s")).head().getDouble(0)
      assert(q.head().getDouble(0) == expected)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", prev._1)
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", prev._2)
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev._3)
    }
  }

  test("parquet row-group min/max stats SKIP groups on a key-clustered layout " +
      "(the pushed filter provably reduces rows materialized by the scan)") {
    // a clustered (sorted) write gives each row group a tight, disjoint
    // min/max on the sort key — exactly the property z-ordering
    // generalizes to two dims; a small block size forces many groups so
    // the skipping is observable on the fixture-sized table
    val out = graft.TempDirs.create("graft-rg").toString
    val li = graft.Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val total = li.count()
    li.sort("l_orderkey").coalesce(1)
      .write.mode("overwrite")
      .option("parquet.block.size", (32 * 1024).toString)
      .parquet(out)
    // AQE off for THIS query only: its final plan hides the scan inside
    // query-stage wrappers, and all this test needs is the plain scan
    // node whose metrics it reads
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = spark.conf.get(aqeKey)
    spark.conf.set(aqeKey, "false")
    val (q, expected) =
      try {
        val q = spark.read.parquet(out)
          .filter(col("l_orderkey") < 100L)
          .agg(count(lit(1)).as("cnt"))
        val expected = li.filter(col("l_orderkey") < 100L).count()
        // collect(), not head(): head wraps a NEW limited execution, whose
        // run would leave THIS QueryExecution's scan metrics untouched
        assert(q.collect()(0).getLong(0) == expected)
        (q, expected)
      } finally spark.conf.set(aqeKey, prevAqe)
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec in the executed plan"))
    assert(scan.metadata("PushedFilters").contains("LessThan(l_orderkey,100)"),
      scan.metadata("PushedFilters"))
    val materialized = scan.metrics("numOutputRows").value
    // the scan must materialize FAR fewer rows than the table holds:
    // whole row groups whose [min,max] misses the predicate are never
    // decoded (generous 50% bar — the claim is "skipped", not a ratio)
    assert(materialized < total / 2,
      s"scan materialized $materialized of $total rows — row-group stats " +
        "pruning is not happening (one giant row group, or pushdown lost)")
    assert(materialized >= expected)
  }
}
