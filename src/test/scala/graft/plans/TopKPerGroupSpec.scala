package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom whole-operator path (logical node → strategy → bounded-heap
  * exec) must agree row-for-row with the window+filter composition it
  * replaces, and its plan must actually BE the custom exec (no silent
  * fallback to the window shape). */
class TopKPerGroupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def ordersDf = graft.Tables(spark, sf, "orders")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("TopK.perGroup equals row_number window + filter, and plans the custom exec") {
    val topk = TopK.perGroup(ordersDf, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
      .orderBy("o_custkey", "rn")
    // physical nodeName strips the Exec suffix; a logical node could not
    // appear in an executed plan, so this match IS the custom exec
    assert(topk.queryExecution.executedPlan.toString.contains("TopKPerGroup"))

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = ordersDf
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .orderBy("o_custkey", "rn")

    val a = topk.collect().toSeq
    val b = windowed.collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("two-phase plan: map-side partial sits below the exchange") {
    val topk = TopK.perGroup(ordersDf, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
    topk.collect()
    val plan = topk.queryExecution.executedPlan.toString
    // tree prints parent-first: final exec, then the exchange it forces,
    // then the pre-shuffle partial, then the scan
    val iFinal = plan.indexOf("TopKPerGroup")
    val iExchange = plan.indexOf("Exchange")
    val iPartial = plan.indexOf("TopKPerGroupPartial")
    assert(iFinal >= 0 && iExchange > iFinal && iPartial > iExchange, plan)
  }

  test("a child already clustered on the group key plans with NO extra exchange") {
    val pre = ordersDf.repartition(col("o_custkey"))
    val topk = TopK.perGroup(pre, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
    topk.collect()
    // AQE's toString prints the final AND the initial plan; count only
    // the final section. Exactly one exchange: the repartition itself;
    // the partial preserves the child's partitioning so the final exec
    // adds none on top.
    val plan = topk.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan)
  }

  test("partial pass-through past the hash budget still yields exact results") {
    // budget 2 trips the partial's advisory filter AND the final's sort
    // fallback on nearly every partition; the result must be identical
    val key = "spark.graft.topk.hashGroupLimit"
    spark.conf.set(key, "2")
    try {
      val a = TopK.perGroup(ordersDf.coalesce(1), Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
        .orderBy("o_custkey", "rn").collect().toSeq
      spark.conf.unset(key)
      val b = TopK.perGroup(ordersDf.coalesce(1), Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
        .orderBy("o_custkey", "rn").collect().toSeq
      assert(a == b && a.nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("TopK.perGroup degraded sort path (hash budget exceeded) matches the heap path") {
    // A hash budget of 2 forces every partition past the limit almost
    // immediately: the bulk of each partition runs through the external-
    // sort fallback, which must produce the identical result set.
    val key = "spark.graft.topk.hashGroupLimit"
    spark.conf.set(key, "2")
    try {
      val degraded = TopK.perGroup(ordersDf, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
        .orderBy("o_custkey", "rn").collect().toSeq
      spark.conf.unset(key)
      val heap = TopK.perGroup(ordersDf, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
        .orderBy("o_custkey", "rn").collect().toSeq
      assert(degraded == heap && degraded.nonEmpty)
    } finally spark.conf.unset(key)
  }

  test("SQLMetrics: heap path reports output rows, groups, pruning; no degradation") {
    val topk = TopK.perGroup(ordersDf, Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
    val n = topk.collect().length
    val nodes = allNodes(topk.queryExecution.executedPlan)
    val fin = nodes.collectFirst { case e: TopKPerGroupExec => e }.get
    val part = nodes.collectFirst { case e: TopKPerGroupPartialExec => e }.get

    assert(fin.metrics("numOutputRows").value == n)
    val distinctGroups = ordersDf.select("o_custkey").distinct().count()
    assert(fin.metrics("numGroups").value == distinctGroups)
    assert(fin.metrics("degradedPartitions").value == 0)
    assert(fin.metrics("spillSize").value == 0)

    // map-side phase: pruned + emitted = scanned, and it actually pruned
    val inputRows = ordersDf.count()
    val emitted = part.metrics("numOutputRows").value
    val pruned = part.metrics("prunedRows").value
    assert(emitted + pruned == inputRows)
    assert(pruned > 0, s"partial pruned nothing (emitted=$emitted of $inputRows)")
    assert(part.metrics("passThroughParts").value == 0)
  }

  test("SQLMetrics: degraded sort path reports the degradation") {
    val key = "spark.graft.topk.hashGroupLimit"
    spark.conf.set(key, "2")
    try {
      val topk = TopK.perGroup(ordersDf, Seq("o_custkey"),
        Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 2)
      val n = topk.collect().length
      val nodes = allNodes(topk.queryExecution.executedPlan)
      val fin = nodes.collectFirst { case e: TopKPerGroupExec => e }.get
      val part = nodes.collectFirst { case e: TopKPerGroupPartialExec => e }.get
      assert(fin.metrics("numOutputRows").value == n)
      assert(fin.metrics("degradedPartitions").value > 0)
      // group census holds on the sort path too (groups counted per
      // partition; the final's input is clustered so no double count)
      val distinctGroups = ordersDf.select("o_custkey").distinct().count()
      assert(fin.metrics("numGroups").value == distinctGroups)
      assert(part.metrics("passThroughParts").value > 0)
    } finally spark.conf.unset(key)
  }

  test("TopK.perGroup handles k larger than the group size") {
    val tiny = ordersDf.filter(col("o_custkey") < 5)
    val topk = TopK.perGroup(tiny, Seq("o_custkey"),
      Seq("o_orderkey" -> true), k = 1000)
      .orderBy("o_custkey", "rn").collect().toSeq
    assert(topk.size == tiny.count())
    // ranks are 1..groupSize, dense
    val perGroup = topk.groupBy(_.getLong(0))
    perGroup.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted == (1 to rows.size).toSeq)
    }
  }
}
