package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-sum contracts of the apportionment and the revenue bridge. */
class AllocationSpec extends SparkSpec {

  private def ordersDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-alloc-spec").toString
    rows.toDF("o_orderkey", "o_orderpriority", "d")
      .select(col("o_orderkey"), col("o_orderkey").as("o_custkey"),
        lit("O").as("o_orderstatus"), lit(100.0).as("o_totalprice"),
        col("d").cast("timestamp").as("o_orderdate"), col("o_orderpriority"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    dir
  }

  test("largest-remainder allocations sum to the budget exactly") {
    // three equal classes: floor gives 333333 each, residual 1 goes to
    // the first by priority tiebreak — the case naive rounding misspends
    val dir = ordersDir(Seq(
      (1L, "A", "2024-01-01"), (2L, "B", "2024-01-01"), (3L, "C", "2024-01-01")))
    val got = RelationalQueries.budgetAllocation(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getInt(3)))
    assert(got.map(_._2).sum == RelationalQueries.AllocBudget)
    assert(got.toSeq == Seq(("A", 333334L, 1), ("B", 333333L, 0), ("C", 333333L, 0)))
  }

  test("fixture allocations sum to the budget; bridge closes per flag") {
    val alloc = RelationalQueries.budgetAllocation(spark, "/root/testdata/sf0.001")
      .agg(sum("alloc")).collect()(0).getLong(0)
    assert(alloc == RelationalQueries.AllocBudget)
    val bridge = RelationalQueries.growthDecomp(spark, "/root/testdata/sf0.001")
      .collect()
    assert(bridge.nonEmpty)
    bridge.foreach { r =>
      val (delta, vol, price) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(math.abs(delta - (vol + price)) < 1e-6,
        s"bridge must close: $delta vs $vol + $price")
    }
  }
}
