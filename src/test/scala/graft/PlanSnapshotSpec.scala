package graft

import scala.jdk.CollectionConverters._

import graft.plans.PlanDigest

/** Plan-regression ledger gate (round 13; streaming coverage round 14):
  * every query's physical plan must carry exactly the operator-count
  * digest committed in `PLAN_SNAPSHOT.json` — batch queries through
  * their executed plan, streaming queries through the last micro-batch's
  * executed plan (state-operator placement included). A join-strategy
  * flip (broadcast → sort-merge), a new shuffle, a dropped pushdown that
  * adds an Exchange, an extra Generate, or a state store that moves
  * across the watermark changes the digest and fails HERE with the query
  * and feature named — the correctness gate can't see those, and at
  * 100 TB they are the regressions that matter. Intentional changes:
  * regenerate via `sbt "runMain graft.PlanSnapshot"`, check the git diff
  * moves exactly what you meant to move, commit the snapshot with the
  * code. */
class PlanSnapshotSpec extends SparkSpec {

  test("every query's plan digest matches the committed snapshot " +
      "(batch plans + streaming micro-batch state plans)") {
    val path = java.nio.file.Paths.get(PlanSnapshot.SnapshotPath)
    assert(java.nio.file.Files.exists(path),
      s"missing ${PlanSnapshot.SnapshotPath} — run `sbt \"runMain graft.PlanSnapshot\"`")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(java.nio.file.Files.readString(path))
    val committed = root.properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap

    val current = PlanSnapshot.digests(spark).toMap
    val gone = committed.keySet -- current.keySet
    val fresh = current.keySet -- committed.keySet
    val moved = current.collect {
      case (n, d) if committed.get(n).exists(_ != d) =>
        s"$n:\n  snapshot: ${committed(n)}\n  current:  $d"
    }
    val report =
      (if (gone.nonEmpty) Seq(s"removed queries still in snapshot: ${gone.toSeq.sorted.mkString(", ")}") else Nil) ++
      (if (fresh.nonEmpty) Seq(s"new queries missing from snapshot: ${fresh.toSeq.sorted.mkString(", ")}") else Nil) ++
      moved
    assert(report.isEmpty,
      "plan digests diverge from PLAN_SNAPSHOT.json — if intentional, " +
        "regenerate via `sbt \"runMain graft.PlanSnapshot\"` and commit:\n" +
        report.mkString("\n"))
  }

  test("digest counting: node names parse through codegen prefixes and tree art") {
    val plan =
      """AdaptiveSparkPlan isFinalPlan=false
        |+- TakeOrderedAndProject(limit=10, orderBy=[n DESC])
        |   +- *(2) HashAggregate(keys=[k], functions=[count(1)])
        |      +- Exchange hashpartitioning(k, 8), ENSURE_REQUIREMENTS
        |         +- *(1) HashAggregate(keys=[k], functions=[partial_count(1)])
        |            +- *(1) Generate explode(xs), [k], false
        |               :- SortMergeJoin [a], [b], Inner
        |               +- FileScan parquet [k,xs] Batched: true
        |""".stripMargin
    val c = PlanDigest.counts(plan)
    assert(c == Map(
      "TakeOrderedAndProject" -> 1, "HashAggregate" -> 2, "Exchange" -> 1,
      "Generate" -> 1, "SortMergeJoin" -> 1, "FileScan" -> 1), c.toString)
    // Sort vs SortMergeJoin vs SortAggregate never alias each other
    val s = PlanDigest.counts("+- Sort [a ASC]\n+- SortAggregate(key=[a])\n+- SortMergeJoin [a], [b]")
    assert(s == Map("Sort" -> 1, "SortAggregate" -> 1, "SortMergeJoin" -> 1))
    // streaming state operators (round 14) parse out of a micro-batch plan,
    // and the dedup variants never alias each other
    val m = PlanDigest.counts(
      """*(4) HashAggregate(keys=[k], functions=[count(1)])
        |+- StateStoreSave [k], state info [ checkpoint = x ], Complete
        |   +- *(3) HashAggregate(keys=[k], functions=[merge_count(1)])
        |      +- StateStoreRestore [k], state info [ checkpoint = x ]
        |         +- StreamingDeduplicateWithinWatermark [k]
        |            +- EventTimeWatermark ts: timestamp, 10 minutes
        |""".stripMargin)
    assert(m == Map("HashAggregate" -> 2, "StateStoreSave" -> 1,
      "StateStoreRestore" -> 1, "StreamingDeduplicateWithinWatermark" -> 1,
      "EventTimeWatermark" -> 1), m.toString)
  }
}
