package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Contracts of the typed-Aggregator moments UDAF: algebraic correctness
  * on a closed-form input, partial-merge plan shape, partitioning
  * stability of the fixed-association finish, and the SQL registration
  * path a pure-SQL user takes. */
class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("moments of 1..9 match the closed form and survive repartitioning") {
    val df = (1L to 9L).toDF("x")
    def run(parts: Int) = df.repartition(parts)
      .agg(MomentsUdaf(col("x")).as("m"))
      .select("m.n_vals", "m.mean", "m.variance")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).head
    val (n, mean, variance) = run(1)
    assert(n == 9L && mean == 5.0 && variance == 7.5) // var_samp(1..9) = 60/8
    // exact-integer buffers + single-division finish: any partitioning
    // must produce bit-identical doubles
    assert(run(7) == ((n, mean, variance)))
  }

  test("degenerate groups: empty -> zeros, singleton -> variance 0") {
    val r = Seq((1L, 42L)).toDF("g", "x")
      .groupBy("g").agg(MomentsUdaf(col("x")).as("m"))
      .select("m.n_vals", "m.mean", "m.variance")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).head
    assert(r == ((1L, 42.0, 0.0)))
  }

  test("the aggregate plans with a map-side partial before the exchange") {
    val plan = graft.text.TextAnalysis.charMoments(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // Aggregator-backed UDAFs plan as two-phase object hash aggregation:
    // partial_momentsagg above the scan, the final merge after the
    // exchange — the buffer, not the rows, crosses the wire
    assert(plan.toLowerCase.contains("partial_momentsagg"),
      s"expected a partial aggregation phase:\n$plan")
  }

  test("buffer algebra: any chunking merges to the single-pass result") {
    // the mergeability contract partial aggregation relies on: reduce a
    // value stream in arbitrary chunk splits, merge the chunk buffers in
    // arbitrary order, finish — identical result to one sequential pass
    val xs = Seq(3L, -7L, 11L, 0L, 42L, -1L, 8L, 5L, 19L, -12L)
    val sequential = MomentsAgg.finish(xs.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce))
    for (cut1 <- 1 until xs.size - 1; cut2 <- (cut1 + 1) until xs.size) {
      val chunks = Seq(xs.slice(0, cut1), xs.slice(cut1, cut2), xs.slice(cut2, xs.size))
        .map(_.foldLeft(MomentsAgg.zero)(MomentsAgg.reduce))
      val forward = MomentsAgg.finish(chunks.reduce(MomentsAgg.merge))
      val reversed = MomentsAgg.finish(chunks.reverse.reduce(MomentsAgg.merge))
      assert(forward == sequential && reversed == sequential,
        s"chunking ($cut1, $cut2) diverged")
    }
  }

  test("SQL registration path: graft_moments usable from spark.sql") {
    spark.udf.register("graft_moments", MomentsUdaf.fn)
    (1L to 9L).toDF("x").createOrReplaceTempView("graft_moments_in")
    val r = spark.sql(
      "SELECT graft_moments(x) AS m FROM graft_moments_in")
      .select("m.n_vals", "m.mean", "m.variance")
      .collect().map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2))).head
    assert(r == ((9L, 5.0, 7.5)))
  }
}
