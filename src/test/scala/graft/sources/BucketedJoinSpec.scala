package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The point of the bucketed layout is the PLAN, not the numbers (the
  * oracle gates those): a join of two tables pre-bucketed on the join
  * key must read bucket pairs directly — zero exchanges under the
  * sort-merge join — where the same join over plain parquet shuffles
  * both sides. */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed co-located join plans no exchange under the sort-merge join") {
    val plan = Formats.bucketedJoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    // the only exchanges are the post-join aggregate's and the final
    // orderBy's range partitioning — the join itself is exchange-free
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (agg + sort), got $exchanges:\n$plan")
    // both scans report the bucket layout
    assert("Bucketed: true".r.findAllIn(plan).size == 2,
      s"expected both scans bucketed:\n$plan")
  }

  test("the same join over plain parquet shuffles both sides (the saved cost)") {
    val orders = graft.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lineitem = graft.Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val unbucketed = orders.hint("merge")
      .join(lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"))
      .orderBy("o_orderpriority")
    val plan = unbucketed.queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges >= 3, s"expected join-side shuffles without bucketing:\n$plan")
  }

  test("bucketed join result matches the plain-parquet join row for row") {
    val bucketed = Formats.bucketedJoin(spark, sf).collect().toSeq
    val plain = graft.Tables(spark, sf, "orders")
      .join(graft.Tables(spark, sf, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy("o_orderpriority")
      .collect().toSeq
    assert(bucketed == plain)
  }
}
