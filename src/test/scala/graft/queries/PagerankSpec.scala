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
}
