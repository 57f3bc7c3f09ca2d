package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Plan-level and semantic contracts of the non-equi join family: the
  * binned range join must never plan a nested-loop/cartesian product
  * (that is its entire reason to exist), and the as-of union+window
  * algorithm must agree with the naive explode-then-rank formulation. */
class RangeAsofSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("binned range join plans an equi shuffle join, never a nested loop") {
    val plan = RelationalQueries.rangeJoinBinned(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"nested-loop join in plan:\n$plan")
  }

  test("as-of join equals the naive equi-join + rank formulation") {
    val fast = RelationalQueries.asofJoin(spark, sf).collect().toSeq

    // naive: explode each event by the user's full order history, keep the
    // latest order at or before the event (ties broken by max orderkey)
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("e_us"))
    val ord = graft.Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_id").orderBy(desc("o_us"), desc("o_orderkey"))
    val naive = ev.join(ord,
        col("user_id") === col("o_custkey") && col("o_us") <= col("e_us"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("asof_orderkey"),
        col("o_totalprice").as("asof_totalprice"))
      .orderBy("event_id")
      .collect().toSeq

    assert(fast == naive && fast.nonEmpty)
  }
}
