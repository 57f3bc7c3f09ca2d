package graft.text

import graft.SparkSpec

/** Accounting identities of the packing sweep (text_pack_sweep): token
  * mass is budget-invariant, capacity = tokens + waste exactly, and
  * raising the budget can only reduce boundary-straddling docs. */
class PackSweepSpec extends SparkSpec {

  test("capacity accounting holds and straddles shrink with budget") {
    val rows = TextAnalysis.packSweep(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == TextAnalysis.PackSweepBudgets)
    // capacity = chunks * budget = waste + tokens, with tokens constant
    val tokens = rows.map { case (b, chunks, _, waste) => chunks * b - waste }
    assert(tokens.distinct.length == 1, s"token mass must be budget-invariant: ${tokens.toSeq}")
    assert(rows.map(_._3).toSeq.sliding(2).forall(w => w(1) <= w(0)),
      "a larger budget cannot create more boundary straddles")
  }
}
