package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Properties of the deterministic HyperLogLog DAU sketch (ev_dau_hll).
  *
  * 1. Accuracy: the registry query ships the RAW harmonic-mean estimate
  *    (the linear-counting small-range branch needs ln, whose last-ulp
  *    behavior is engine-specific, so it stays out of the oracle-hashed
  *    output); this spec applies the standard correction driver-side —
  *    E* = m·ln(m/V) when E ≤ 2.5m and V > 0 — and pins each day's
  *    corrected estimate within the sketch's error envelope of the exact
  *    DAU (σ ≈ 1.04/√64 ≈ 13% for the raw branch; LC is tighter).
  * 2. Merge law: registers of a union of event frames equal the
  *    bucket-wise MAX of the frames' registers — the property that makes
  *    the sketch mergeable across partitions, sources, and days without
  *    rescanning (the whole point of HLL at 100 TB).
  */
class DauHllSpec extends SparkSpec {

  private val m = EventQueries.HllBuckets.toDouble

  test("corrected estimate lands within the HLL error envelope per day") {
    val rows = EventQueries.dauHll(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length >= 10, "fixture should span many days")
    val errs = rows.map { r =>
      val dau = r.getLong(1).toDouble
      val raw = r.getDouble(2)
      val v = r.getLong(3).toDouble
      val est = if (raw <= 2.5 * m && v > 0) m * math.log(m / v) else raw
      math.abs(est - dau) / dau
    }
    // Per-day: 45% is >3σ for both branches at these cardinalities;
    // mean over ~30 days must sit well inside one σ.
    assert(errs.forall(_ < 0.45), s"per-day error too large: ${errs.max}")
    val mean = errs.sum / errs.length
    assert(mean < 0.20, s"mean error $mean exceeds the sketch envelope")
  }

  test("streaming monitor equals the batch sketch read-off") {
    val batch = EventQueries.dauHll(spark, "/root/testdata/sf0.001")
      .select("day", "hll_est", "zero_regs").collect().toSeq
    val online = graft.streaming.StreamingOps
      .streamDauHll(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(online == batch)
  }

  test("registers of a union are the bucket-wise max of the parts") {
    import spark.implicits._
    val all = (1L to 500L).map(u => ("2024-01-01", u)).toDF("d", "user_id")
      .select(col("d").cast("date").as("day"), col("user_id"))
    // Overlapping halves — merge must also dedup the shared users.
    val a = all.filter(col("user_id") <= 300)
    val b = all.filter(col("user_id") >= 200)
    val whole = EventQueries.hllRegisters(all)
    val merged = EventQueries.hllRegisters(a)
      .unionAll(EventQueries.hllRegisters(b))
      .groupBy("day", "b").agg(max("m").as("m"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
    // And the read-off agrees exactly — same registers, same estimate.
    val e1 = EventQueries.hllEstimate(whole).collect()(0)
    val e2 = EventQueries.hllEstimate(merged).collect()(0)
    assert(e1.getDouble(1) == e2.getDouble(1) && e1.getLong(2) == e2.getLong(2))
  }
}
