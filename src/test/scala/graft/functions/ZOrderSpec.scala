package graft.functions

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout contracts: the kernel is bit-identical to its portable
  * spelling, and the curve actually buys the 2-D pruning it claims —
  * asserted at tile level and at file-listing level. */
class ZOrderSpec extends SparkSpec {

  // the full 256×256 grid, one row per cell
  private def grid = spark.range(0, 65536).select(
    (col("id") % 256).as("x"),
    (col("id") / 256).cast("long").as("y"))

  test("native zvalue kernel equals the shift-sum spec bit-for-bit") {
    val diff = grid.select(
      ZOrder.zvalue("x", "y").as("a"),
      ZOrder.zvalueSpec("x", "y").as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
    // spot-check the bit layout: (5, 3) -> 10101 | 1111? -> 27
    assert(ZOrder.interleave16(5L, 3L) == 27L)
    // 16-bit truncation: bit 16 of either input never reaches the output
    assert(ZOrder.interleave16(1L << 16, 0L) == 0L)
  }


  test("explicit cast-derived bigint survives project collapse and predicate pushdown") {
    // regression for the round-6 optimizer crash: y = CAST(double AS
    // BIGINT) in a Project, zvalue over it in the next, then a filter —
    // CollapseProject inlines the Cast into zvalue's child and
    // PushDownPredicates re-checks the expression mid-optimization. The
    // type contract must be stable under that rewrite (it reads
    // dataTypes, never Cast structure), so this plans and runs.
    val q = spark.range(0, 1024)
      .select((col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .select(ZOrder.zvalue("x", "y").as("z"))
      .filter(col("z") > 100L)
    assert(q.count() > 0)
    // (the same shape through SQL + the injected function builder is
    // pinned in GraftExtensionsSpec, which owns an extensions session)
  }

  test("a 2-D box touches O(perimeter) z-tiles but full slabs of a row-major layout") {
    // ztile = zval >> 8: one 16×16 spatial block. rowtile = the y-slab a
    // row-major (sort by y, then x) layout would store contiguously.
    val tiled = grid
      .withColumn("ztile", shiftright(ZOrder.zvalue("x", "y"), 8))
      .withColumn("rowtile", col("y"))
    val box = col("x") < 16 && col("y") < 16
    assert(tiled.filter(box).select("ztile").distinct().count() == 1)
    assert(tiled.filter(box).select("rowtile").distinct().count() == 16)
    // a wider box still stays near-minimal: 32×32 = exactly the 4
    // adjacent z-tiles, vs 32 row slabs
    val box2 = col("x") < 32 && col("y") < 32
    assert(tiled.filter(box2).select("ztile").distinct().count() == 4)
    assert(tiled.filter(box2).select("rowtile").distinct().count() == 32)
  }

  test("partitioned-by-ztile write prunes a box query at file-listing time") {
    val out = graft.TempDirs.create("graft-zorder").toString
    grid.withColumn("ztile", shiftright(ZOrder.zvalue("x", "y"), 8))
      .write.mode("overwrite").partitionBy("ztile").parquet(out)
    // the box's tile set is computable from its corners (any z-curve
    // reader does this); here the 16×16 box is exactly tile 0
    val q = spark.read.parquet(out)
      .filter(col("ztile") === 0 && col("x") < 16 && col("y") < 16)
      .agg(count(lit(1)).as("cnt"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(ztile"),
      s"expected ztile partition filter in scan:\n$plan")
    assert(q.head().getLong(0) == 256L) // the full box, nothing lost
  }
}
