package graft.queries

import org.apache.spark.sql.functions.col

import graft.{SparkSpec, Tables}

/** One PageRank round over the part→supplier bipartite graph must equal
  * the driver-side brute force in exact Long arithmetic, and the damped
  * redistribution must conserve rank up to the documented integer-drop
  * (each part loses < deg remainder units when splitting its rank).
  */
class PagerankSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("pagerankIter: brute-forced damped redistribution matches exactly") {
    val rows = RelationalQueries.pagerankIter(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edges = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scale = RelationalQueries.PrScale
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val contribs = edges.map { case (p, s) => (s, scale / deg(p)) }
    val expected = contribs.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (s, cs) =>
        (s, cs.length.toLong, 15L * scale / 100 + 85L * cs.map(_._2).sum / 100)
    }
    assert(rows.toSeq == expected)
    assert(rows.nonEmpty)
    // conservation up to remainder drop: the redistributed mass is within
    // nEdges units of the full nParts·scale source mass
    val redistributed = contribs.map(_._2).sum
    val source = deg.size.toLong * scale
    assert(redistributed <= source)
    assert(source - redistributed < edges.length.toLong)
  }

  test("pagerankRound2: back-propagation composes round one's output as its rank input") {
    val r2 = RelationalQueries.pagerankRound2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val r1 = RelationalQueries.pagerankIter(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val edges = Tables(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val scale = RelationalQueries.PrScale
    val sdeg = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expected = edges.map { case (p, s) => (p, r1(s) / sdeg(s)) }
      .groupBy(_._1).toSeq.sortBy(_._1).map { case (p, cs) =>
        (p, cs.length.toLong, 15L * scale / 100 + 85L * cs.map(_._2).sum / 100)
      }
    assert(r2.toSeq == expected)
    // every part with an edge gets a round-2 rank (bipartite closure)
    assert(r2.map(_._1).toSet == edges.map(_._1).toSet)
  }

  test("pagerankConverged: L-inf deltas contract at the damping rate and total rank is conserved") {
    val (ranks, deltas) = RelationalQueries.pagerankTrajectory(spark, sf)
    assert(deltas.length == RelationalQueries.PrAlternations ||
      (deltas.length < RelationalQueries.PrAlternations && deltas.last == 0L),
      s"loop must run the full budget or exit on an exact fixed point; deltas=$deltas")
    // contraction: each full alternation damps by 0.85 twice (once per
    // side), so consecutive L-inf deltas must not grow — and the overall
    // trajectory must shrink strictly (plus integer-truncation slack of
    // 1 grid unit per comparison)
    deltas.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1, s"delta grew: $deltas")
      case _ =>
    }
    assert(deltas.last < deltas.head, s"no contraction across the run: $deltas")

    // conservation: each part update is 0.15·scale + 0.85·(mass arriving
    // from its suppliers); summed over all parts the arriving mass is at
    // most the full supplier mass of the previous half-round, and integer
    // division only ever DROPS mass. So the total sits in
    // (0.15·n·scale, n·scale] — the damped-sum window.
    val scale = RelationalQueries.PrScale
    val totals = ranks.agg(
      org.apache.spark.sql.functions.sum("r"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))).head()
    val (total, nParts) = (totals.getLong(0), totals.getLong(1))
    assert(total > 15L * scale / 100 * nParts, s"total $total below the damping floor")
    // upper bound: uniform start is the mass maximum for this bipartite
    // alternation only up to supplier-side amplification; bound loosely
    // by 2× the uniform mass (the spec's job is the ORDER of magnitude —
    // exactness lives in the oracle hash)
    assert(total < 2L * scale * nParts, s"total $total implausibly large")

    // the registered query is exactly the trajectory's final frame
    val q = RelationalQueries.pagerankConverged(spark, sf)
    assert(q.columns.toSeq == Seq("partkey", "rank_final"))
    assert(q.count() == nParts)
  }
}
