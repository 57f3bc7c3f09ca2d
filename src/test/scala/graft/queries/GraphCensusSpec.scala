package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Proves the degree-ordered triangle census on graphs whose counts are
  * known in closed form, against a brute-force a<b<c join — the
  * orientation is a counting device and must be invisible in the result.
  */
class GraphCensusSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    import spark.implicits._
    // canonicalize p1 < p2, dedupe
    pairs.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("p1", "p2")
  }

  private def census(e: DataFrame): (Long, Long, Long) = {
    val r = RelationalQueries.triangleCensus(e).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def brute(e: DataFrame): Long = {
    val ps = e.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = ps.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    nodes.combinations(3).count { case Seq(a, b, c) =>
      ps((a, b)) && ps((b, c)) && ps((a, c))
    }
  }

  test("K4 has 4 triangles, 6 edges, 4 nodes") {
    val e = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(census(e) == (4L, 6L, 4L))
  }

  test("a star graph has wedges but zero triangles") {
    val e = edges((1, 2), (1, 3), (1, 4), (1, 5), (1, 6))
    assert(census(e) == (6L, 5L, 0L))
  }

  test("two triangles sharing an edge count as exactly two") {
    val e = edges((1, 2), (2, 3), (1, 3), (3, 4), (2, 4))
    assert(census(e) == (4L, 5L, 2L))
  }

  test("planted basket corpus: all three registered miners hit the " +
    "closed forms (SoakBasket's gate, r16)") {
    // G=12 cliques: big enough that the BFS cap (20) bites (cliques past
    // g=10 stay unvisited), small enough for a unit test
    val groups = 12L
    val dir = graft.TempDirs.create("graft-basket").toString
    graft.ingest.BasketCorpus.write(spark, dir, groups)
    val tri = RelationalQueries.triangles(spark, dir).head()
    assert((tri.getLong(0), tri.getLong(1), tri.getLong(2)) ==
      (4 * groups, 7 * groups - 1, 4 * groups))
    val bfs = RelationalQueries.reachability(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val wantBfs = graft.ingest.BasketCorpus.expectedBfs(
      groups, RelationalQueries.ReachMaxHops)
    assert(bfs == wantBfs, s"got $bfs")
    // the cap actually bit: hop 20 is the last row and covers only the
    // entry node of clique 10
    assert(bfs.last == ((20, 1L, 40L, 40L)))
    val pairs = RelationalQueries.copurchasePairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(pairs == graft.ingest.BasketCorpus.expectedTopPairs(groups, 20))
  }

  test("hub-heavy random graph matches the brute-force a<b<c count") {
    // deterministic pseudo-random graph with a skewed hub (node 0 links
    // to everyone) — exactly the shape where naive wedge generation
    // explodes and orientation must still count each triangle once
    val rnd = new scala.util.Random(42)
    val hub = (1L to 20L).map(v => (0L, v))
    val rest = Seq.fill(40)((rnd.nextInt(20) + 1L, rnd.nextInt(20) + 1L))
      .filter { case (a, b) => a != b }
    val e = edges(hub ++ rest: _*)
    val (_, _, tri) = census(e)
    assert(tri == brute(e))
    assert(tri > 0L, "fixture graph should contain triangles")
  }
}
