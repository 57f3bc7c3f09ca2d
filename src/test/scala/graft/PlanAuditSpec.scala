package graft

import graft.SparkSpec

/** Registry-wide plan audit: NO batch query may plan a CartesianProduct,
  * and BroadcastNestedLoopJoin is allowed only where it is the intended
  * shape (a corpus scan × broadcast tiny query side in the similarity
  * family — a bounded 1×N product, not an N×M blowup). Every future
  * query lands under this gate automatically, so an accidental
  * cross-join (the classic 100 TB plan bug: a dropped join key turns an
  * equi-join quadratic) fails CI instead of shipping. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // streaming queries EXECUTE inside their builder (runToMemory); their
  // stateful plans are asserted in the streaming specs instead
  private def skip(name: String): Boolean =
    name.startsWith("stream_") || name == "tw_q2_stream_top_emoji"

  // intended broadcast 1×N products: a tiny broadcast query side against
  // the corpus scan (crossJoin(broadcast(q)) in Similarity; recall_eval's
  // ground-truth pass reuses exactly that shape)
  private val broadcastProductIntended =
    Set("sim_cosine_topk", "sim_knn_batch", "sim_range_search", "sim_hybrid_search",
      "sim_recall_eval")

  test("no batch query plans a cartesian product or an unintended nested-loop join") {
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip)
    assert(names.size >= 80)
    val offenders = names.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin") &&
        !broadcastProductIntended(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (bnl) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"unintended product joins:\n${offenders.mkString("\n")}")
  }
}
