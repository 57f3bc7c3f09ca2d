package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact integer moments as a typed `Aggregator` — the Dataset-typed
  * custom-aggregation API (the third aggregation surface next to the
  * built-in declarative aggregates and the `TypedImperativeAggregate`
  * behind `graft_topk`): a user writes zero/reduce/merge/finish over
  * plain Scala values and registers it with `functions.udaf`.
  *
  * The buffer is (n, Σx, Σx²) in exact BIGINT — fully mergeable, so the
  * plan keeps map-side partial aggregation and the exchange carries one
  * 24-byte buffer per group per partition (the sketch property every
  * distributed aggregate needs at 100 TB). Mean and variance happen
  * ONCE in `finish` as fixed-association double expressions, so results
  * are bit-deterministic across partitionings and engines (a running
  * Welford mean would be neither). Variance is the n−1 sample form;
  * groups with n < 2 report 0.0 rather than a 0/0 NaN.
  */
case class Moments(n_vals: Long, mean: Double, variance: Double)

object MomentsAgg extends Aggregator[Long, (Long, Long, Long), Moments] {
  override def zero: (Long, Long, Long) = (0L, 0L, 0L)
  // exact-arithmetic contract enforced, not assumed: x*x overflows Long
  // for |x| above ~3.04e9, so the squares (and the sums, which overflow
  // only after the squares already would) go through the checked ops —
  // an out-of-range input fails loudly instead of corrupting the moments
  override def reduce(b: (Long, Long, Long), x: Long): (Long, Long, Long) =
    (b._1 + 1, Math.addExact(b._2, x), Math.addExact(b._3, Math.multiplyExact(x, x)))
  override def merge(a: (Long, Long, Long), b: (Long, Long, Long)): (Long, Long, Long) =
    (a._1 + b._1, Math.addExact(a._2, b._2), Math.addExact(a._3, b._3))
  override def finish(r: (Long, Long, Long)): Moments = {
    val (n, s, sq) = r
    if (n == 0) Moments(0L, 0.0, 0.0)
    else {
      val mean = s.toDouble / n
      // fixed association mirrored verbatim in the DuckDB oracle:
      // (sq - (s*s)/n) / (n-1)
      val variance =
        if (n < 2) 0.0
        else (sq.toDouble - ((s.toDouble * s.toDouble) / n)) / (n - 1)
      Moments(n, mean, variance)
    }
  }
  override def bufferEncoder: Encoder[(Long, Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}

object MomentsUdaf {
  /** Column-API handle; also registrable by name for pure-SQL use via
    * `spark.udf.register("graft_moments", MomentsUdaf.fn)` (pinned in
    * MomentsSpec). */
  val fn = udaf(MomentsAgg)
  def apply(c: Column): Column = fn(c)
}
