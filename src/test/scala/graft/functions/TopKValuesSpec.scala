package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom TypedImperativeAggregate must (a) agree with the window
  * formulation of "top k values per group" regardless of partitioning —
  * which exercises the partial-update / shuffle-serialize / merge path —
  * and (b) actually plan as a two-phase aggregate (partial before the
  * exchange), the property that bounds its shuffle volume. */
class TopKValuesSpec extends SparkSpec {
  import spark.implicits._

  private def topkDf(parts: Int) = {
    val df = spark.range(0, 1000)
      .select((col("id") % 7).as("g"),
        ((col("id") * 37 % 1000) / 10.0).as("v"))
      .repartition(parts)
    val aggCol = org.apache.spark.sql.GraftBridge.column(
      TopKValues(org.apache.spark.sql.GraftBridge.expression(col("v")), 4)
        .toAggregateExpression())
    df.groupBy("g").agg(aggCol.as("topv")).orderBy("g")
  }

  test("top-k agg equals the sorted-slice spelling under any partitioning") {
    val expected = spark.range(0, 1000)
      .select((col("id") % 7).as("g"), ((col("id") * 37 % 1000) / 10.0).as("v"))
      .groupBy("g").agg(slice(sort_array(collect_list("v"), asc = false), 1, 4).as("topv"))
      .orderBy("g").collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    for (parts <- Seq(1, 3, 13)) {
      val got = topkDf(parts).collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
      assert(got == expected, s"parts=$parts")
    }
  }

  test("top-k agg plans as two-phase (partial aggregate before the exchange)") {
    val plan = topkDf(5).queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), s"expected a partial phase:\n$plan")
  }

  test("eval is non-destructive: the aggregate works as a window function") {
    val df = Seq((1L, 5.0), (1L, 9.0), (1L, 2.0), (2L, 3.0), (2L, 7.0))
      .toDF("g", "v")
    val aggCol = org.apache.spark.sql.GraftBridge.column(
      TopKValues(org.apache.spark.sql.GraftBridge.expression(col("v")), 2)
        .toAggregateExpression())
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    // every row of a group must see the SAME (complete) top-k — a
    // destructive eval would drain the buffer after the first row
    val got = df.withColumn("topv", aggCol.over(w))
      .select("g", "topv").distinct().orderBy("g")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(got == Seq((1L, Seq(9.0, 5.0)), (2L, Seq(7.0, 3.0))))
  }

  test("groups smaller than k emit all their values, sorted descending") {
    val df = Seq((1L, 5.0), (1L, 9.0), (2L, 3.0)).toDF("g", "v")
    val aggCol = org.apache.spark.sql.GraftBridge.column(
      TopKValues(org.apache.spark.sql.GraftBridge.expression(col("v")), 10)
        .toAggregateExpression())
    val got = df.groupBy("g").agg(aggCol.as("topv")).orderBy("g")
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq
    assert(got == Seq((1L, Seq(9.0, 5.0)), (2L, Seq(3.0))))
  }
}
