package graft.similarity

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The full k-means driver loop: round 1 must BE the registered
  * one-round primitive, and the run must exhibit Lloyd's descent —
  * the clustering objective (sum over vectors of the squared grid
  * distance to the assigned centroid) non-increasing every round.
  * Exact fixed point is out of reach at this budget on the fixture
  * (the 1024-grid is fine; ~280 of 640 grid entries still move at
  * round 8), so the spec pins the convergence INVARIANT rather than
  * the terminal state; the stop probe's correctness (exit iff zero
  * movement, output-neutral by the identity argument) is documented
  * in the operator and pinned by the oracle hash at the fixed count.
  */
class KmeansRunSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def vdim = {
    val emb = Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    emb.select(col("vec_id"), posexplode(col("embedding")))
      .select(col("vec_id"), col("pos").as("dim"),
        floor(col("col").cast("double") * 1024).cast("long").as("xq"))
  }

  private def lloydCost(cent: org.apache.spark.sql.DataFrame): Long =
    vdim.join(broadcast(cent), Seq("dim"))
      .groupBy("vec_id", "c_label")
      .agg(sum((col("xq") - col("cq")) * (col("xq") - col("cq"))).as("dist"))
      .groupBy("vec_id").agg(min("dist").as("md"))
      .agg(sum("md")).head().getLong(0)

  test("round 1 of the run IS the kmeansIter primitive, exactly") {
    val one = Similarity.kmeansTrajectory(spark, sf, maxRounds = 1)._1
      .select(col("c_label").as("cell"), col("dim"), col("n_members"), col("cq"))
      .orderBy("cell", "dim")
      .collect().map(_.toSeq)
    val iter = Similarity.kmeansIter(spark, sf)
      .collect().map(_.toSeq)
    assert(one.toSeq == iter.toSeq)
  }

  test("Lloyd descent: the quantized clustering objective is non-increasing every round") {
    val emb = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val cent0 = emb.select(col("label").as("c_label"), posexplode(col("embedding")))
      .groupBy(col("c_label"), col("pos").as("dim"))
      .agg(floor((sum(col("col").cast("string").cast("decimal(38,30)")).cast("double") /
        count(lit(1))) * 1024).cast("long").as("cq"))
    val costs = lloydCost(cent0) +: (1 to Similarity.KmeansRunRounds).map { r =>
      lloydCost(Similarity.kmeansTrajectory(spark, sf, maxRounds = r)._1
        .select(col("c_label"), col("dim"), col("cq")))
    }
    costs.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"objective rose: $costs")
      case _ =>
    }
    assert(costs.last < costs.head, s"no descent across the run: $costs")
  }

  test("the run executes its full round budget on the fixture (no premature stop)") {
    val (_, moved) = Similarity.kmeansTrajectory(spark, sf)
    assert(moved.length == Similarity.KmeansRunRounds)
    assert(moved.forall(_ > 0L), s"probe reported a zero-movement round: $moved")
  }
}
