package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bucketing = the pre-shuffle a 100 TB deployment pays once at ingest so
  * every subsequent fact-fact join on the bucket key runs with NO exchange.
  * This test materializes both join sides bucketed on the key and asserts
  * the join plan contains no shuffle (the bucketed scans already satisfy
  * the join's required distribution). */
class BucketedJoinSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a non-broadcast join so the distribution requirement is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      spark.read.parquet(s"$dir/lineitem.parquet")
        .select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"),
        s"expected a shuffle-class join operator:\n$plan")
      // everything BELOW the join (its two bucketed scan inputs) must be
      // exchange-free; the aggregation above it shuffles on a different
      // key, which is expected
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"),
        s"bucketed join must not re-shuffle its inputs:\n$plan")
      assert(joinSubtree.contains("Bucketed: true"),
        s"join inputs must be the bucketed scans:\n$plan")

      // and it computes the same result as the plain (shuffling) join
      val expected = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(joined.orderBy("o_orderpriority").collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
