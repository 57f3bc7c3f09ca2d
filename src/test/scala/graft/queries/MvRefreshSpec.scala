package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Incremental MV maintenance (rel_mv_refresh): the refresh must equal
  * the MV's defining full recompute, and the mid-month cutoff must make
  * the straddling month a REAL merge — a base partial and a delta
  * partial combining for one group, not a disjoint union. */
class MvRefreshSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("refresh equals the defining full recompute") {
    val refreshed = RelationalQueries.mvRefresh(spark, dir)
    val full = graft.Tables(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("month")
    assert(refreshed.exceptAll(full).isEmpty && full.exceptAll(refreshed).isEmpty)
  }

  test("the cutoff month merges a base partial with a delta partial") {
    // run the query first so the artifact exists for this sf dir
    val finalJan = RelationalQueries.mvRefresh(spark, dir)
      .filter(col("month") === lit("2001-01-01").cast("date"))
      .collect()(0).getLong(1)
    val baseJan = spark.read
      .parquet(s"${graft.similarity.IndexStore.Root}/mv_monthly")
      .filter(col("month") === lit("2001-01-01").cast("date"))
      .collect()(0).getLong(1)
    assert(baseJan > 0L, "base partial for the straddling month must exist")
    assert(baseJan < finalJan,
      "delta rows must have merged into the straddling month")
  }
}
