package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The PCA power-iteration RUN must be the loop its one-step primitive
  * documented: round 1 IS `pcaPowerIter` exactly (v₀ = all-ones), the
  * grid renormalization invariant holds at the fixed point, and the
  * driver loop executes its budget (or stops at an exact fixed point,
  * which the unrolled oracle provably reproduces). */
class PcaRunSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("round 1 of the run IS the pcaPowerIter primitive, exactly") {
    val (v1, rounds) = Similarity.pcaTrajectory(spark, sf, maxRounds = 1)
    assert(rounds == 1)
    val run = v1.orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    val step = Similarity.pcaPowerIter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(2))).toSeq // (dim, v_next)
    assert(run == step)
  }

  test("renormalization invariant: the max-|component| maps to exactly the grid scale") {
    val out = Similarity.pcaRun(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(out.nonEmpty)
    // (|gmax|·scale) div gmax == scale for the argmax component, and no
    // component can exceed it — the vector always lands ON the grid
    assert(out.map { case (_, v) => math.abs(v) }.max == Similarity.PowerScale)
  }

  test("the loop runs its full budget or stops at an exact fixed point of the round map") {
    val (vFinal, rounds) = Similarity.pcaTrajectory(spark, sf)
    if (rounds < Similarity.PcaRunRounds) {
      // early stop claimed a fixed point: one more round must not move it
      val (vAgain, _) = Similarity.pcaTrajectory(spark, sf, maxRounds = rounds + 1)
      val a = vFinal.orderBy("dim").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val b = vAgain.orderBy("dim").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(a == b)
    } else assert(rounds == Similarity.PcaRunRounds)
  }
}
