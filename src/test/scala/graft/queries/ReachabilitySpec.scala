package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** BFS hop semantics on graphs with known answers: min-hop distances
  * through cycles, unreachable components absent, and the shared hop cap
  * honored on a path longer than it — the three contracts the
  * rel_reachability oracle's capped recursive CTE encodes. */
class ReachabilitySpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("p1", "p2")
  }

  private def hist(e: DataFrame): Seq[(Int, Long, Long, Long)] =
    RelationalQueries.bfsHistogram(e).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("min-hop distances through a cycle, from the smallest node") {
    // 1-2-3 triangle with a tail 3-4: dist(1)=0, dist(2)=dist(3)=1,
    // dist(4)=2 — the cycle must not re-enqueue visited nodes.
    val got = hist(edges((1, 2), (2, 3), (3, 1), (3, 4)))
    assert(got == Seq((0, 1L, 1L, 1L), (1, 2L, 2L, 3L), (2, 1L, 4L, 4L)))
  }

  test("components not containing the seed never appear") {
    val got = hist(edges((1, 2), (10, 11), (11, 12)))
    assert(got == Seq((0, 1L, 1L, 1L), (1, 1L, 2L, 2L)))
    assert(got.map(_._2).sum == 2L, "10/11/12 must be absent")
  }

  test("the hop cap bounds a path longer than ReachMaxHops") {
    // chain 1-2-...-25: nodes beyond hop 20 are out of scope on BOTH
    // engines (the oracle's recursive CTE carries the same constant).
    val chain = (1L to 24L).map(i => (i, i + 1))
    val got = hist(edges(chain: _*))
    assert(got.map(_._1).max == RelationalQueries.ReachMaxHops)
    assert(got.map(_._2).sum == RelationalQueries.ReachMaxHops + 1L)
  }
}
