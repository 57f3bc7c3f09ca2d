package graft.plans

import graft.SparkSpec

/** SQLMetrics observability sweep over the REGISTERED custom-exec
  * queries (round 17, VERDICT r16 #8): the plan ledger pins that each
  * query plans its custom node; this suite pins that the node's metrics
  * are PRESENT AND POPULATED after execution — a refactor that silently
  * dropped the metric wiring (or rerouted a registered query off the
  * custom exec) fails here by name. Assertions are non-zero presence,
  * not exact counts: registered queries end in a global sort, whose
  * range exchange SAMPLES the child (one extra pass), legitimately
  * inflating child metrics. */
class CustomExecMetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def executedMetrics(name: String,
      pick: PartialFunction[org.apache.spark.sql.execution.SparkPlan,
        org.apache.spark.sql.execution.SparkPlan]): Map[String, Long] = {
    val df = graft.SparkEntry.queries(name)(spark, sf)
    val n = df.collect().length
    assert(n > 0, s"$name returned no rows")
    val exec = allNodes(df.queryExecution.executedPlan).collectFirst(pick)
      .getOrElse(fail(s"$name did not plan its custom exec"))
    exec.metrics.map { case (k, m) => k -> m.value }
  }

  test("registered as-of queries populate numMatched/numOutputRows") {
    for (q <- Seq("ev_asof_enrich", "ev_asof_forward", "ev_asof_sql",
        "ev_asof_tol_sql")) {
      val m = executedMetrics(q, { case e: AsOfJoinExec => e })
      assert(m("numOutputRows") > 0, s"$q numOutputRows")
      assert(m("numMatched") > 0, s"$q numMatched")
      assert(m("numMatched") <= m("numOutputRows"), s"$q matched <= output")
    }
  }

  test("registered interval queries populate peakActive/numOutputRows") {
    for (q <- Seq("ev_interval_join", "ev_interval_sql")) {
      val m = executedMetrics(q, { case e: IntervalJoinExec => e })
      assert(m("numOutputRows") > 0, s"$q numOutputRows")
      assert(m("peakActive") >= 1, s"$q peakActive")
    }
  }

  test("the registered top-k query populates the bounded-heap metrics") {
    val m = executedMetrics("rel_topk_per_group", { case e: TopKPerGroupExec => e })
    assert(m("numOutputRows") > 0)
    assert(m("numGroups") > 0)
    assert(m("degradedPartitions") == 0)
  }
}
