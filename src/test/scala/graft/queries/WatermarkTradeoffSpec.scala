package graft.queries

import graft.SparkSpec

/** The watermark-delay sweep must be the decision table its lateness
  * profile motivates: mass conservation at every candidate delay,
  * monotone admission, and an exact anchor to the registered lateness
  * histogram at the one bucket the display cap cannot distort. */
class WatermarkTradeoffSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("mass conserved, admission monotone, delays are the registered sweep") {
    val rows = EventQueries.watermarkTradeoff(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.map(_._1) == EventQueries.WatermarkSweepMin)
    val totals = rows.map { case (_, a, d) => a + d }.distinct
    assert(totals.size == 1 && totals.head > 0,
      "admitted + dropped must equal the corpus total at every delay")
    assert(rows.map(_._2) == rows.map(_._2).sorted,
      "admitted mass must be monotone in the delay")
  }

  test("retentionMatrix: offset-0 is the cohort size, later offsets bounded by it, mass anchors") {
    val rows = EventQueries.retentionMatrix(spark, sf).collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (_, g) =>
      val size0 = g.find(_._2 == 0L).map(_._3)
      assert(size0.nonEmpty, "every cohort must have its offset-0 row")
      // every user is active in their first hour, so no offset exceeds it
      assert(g.forall(_._3 <= size0.get))
    }
    // the matrix sums to the distinct (user, hour) activity mass — the
    // same frame ev_retention aggregates per hour
    val activity = EventQueries.retention(spark, sf).collect()
      .map(_.getLong(1)).sum
    assert(rows.map(_._3).sum == activity)
  }

  test("funnelWindowed: monotone stages, n_signup anchors to the unbounded funnel") {
    val r = EventQueries.funnelWindowed(spark, sf).collect().head
    val (nS, nC, nP) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nS >= nC && nC >= nP, "conversion can only narrow down-funnel")
    assert(nS > 0)
    // stage 1 is window-free: it must equal the unbounded funnel's count
    val unbounded = EventQueries.funnel(spark, sf).collect().head.getLong(0)
    assert(nS == unbounded)
    // the 2h bound actually bites relative to unbounded ordering on the
    // fixture OR the fixture converts nobody — either way the windowed
    // count can never exceed a pure-order one with the same anchors
    assert(nC <= nS)
  }

  test("zero-delay admission anchors to the lateness histogram's on-time bucket") {
    // the display cap only folds buckets ABOVE it, so late_min = 0 is
    // identical between the capped histogram and the uncapped sweep
    val admitted0 = EventQueries.watermarkTradeoff(spark, sf).collect()
      .find(_.getLong(0) == 0L).get.getLong(1)
    val onTime = EventQueries.lateness(spark, sf).collect()
      .find(_.getLong(0) == 0L).map(_.getLong(1)).getOrElse(0L)
    assert(admitted0 == onTime)
  }
}
