package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structure of the all-vectors kNN graph (sim_knn_graph): degree is
  * min(k, |cell| − 1) per vector, every edge stays inside its source's
  * IVF cell (the candidate generator's contract), and the ranking runs
  * through the bounded-heap operator, not a window sort. */
class KnnGraphSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("every vector gets min(k, cell size - 1) neighbors from its own cell") {
    val assign = Similarity.cellAssignments(spark, sf)
    val cellSize = assign.groupBy("cell").agg(count(lit(1)).as("sz"))
    val graph = Similarity.knnGraph(spark, sf)
    // degree check
    val deg = graph.groupBy("src").agg(count(lit(1)).as("deg"))
      .join(assign.withColumnRenamed("vec_id", "src"), Seq("src"))
      .join(cellSize, Seq("cell"))
    val badDeg = deg.filter(col("deg") =!=
      least(lit(Similarity.KnnGraphK.toLong), col("sz") - 1L)).count()
    assert(badDeg == 0L)
    assert(deg.count() == assign.count(), "every vector must appear as src")
    // locality check: src and dst share a cell
    val e = graph
      .join(assign.withColumnRenamed("vec_id", "src")
        .withColumnRenamed("cell", "src_cell"), Seq("src"))
      .join(assign.withColumnRenamed("vec_id", "dst")
        .withColumnRenamed("cell", "dst_cell"), Seq("dst"))
    assert(e.filter(col("src_cell") =!= col("dst_cell")).count() == 0L)
  }

  test("graph build plans the bounded-heap operator, not a window sort") {
    val plan = Similarity.knnGraph(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup ["), s"expected TopKPerGroup:\n$plan")
  }

  test("NN-descent recall improves monotonically round over round") {
    // exact ground truth, brute-forced driver-side on the 500-vector
    // fixture (probes = the recall eval's 1-in-25 sample), with the
    // operators' exact ranking spelling: round(cos, 4) desc, dst asc
    val emb = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      // HALF_UP like Spark's round(x, 4) — rint (half-even) would flip
      // the truth ordering on an exact 4th-decimal tie
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val probes = emb.keys.filter(_ % Similarity.GraphProbeMod == 0).toSeq
    val truth = probes.flatMap { q =>
      emb.keys.filter(_ != q).toSeq
        .map(v => (v, cos(emb(q), emb(v))))
        .sortBy { case (v, c) => (-c, v) }
        .take(Similarity.KnnGraphK)
        .map { case (v, _) => (q, v) }
    }.toSet
    val recalls = (0 to Similarity.DescentRounds).map { r =>
      val edges = Similarity.descentRanked(spark, sf, r)
        .select("src", "dst").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      truth.count(edges.contains).toDouble / truth.size
    }
    assert(recalls.sliding(2).forall { case Seq(a, b) => b >= a },
      s"recall must not decrease: $recalls")
    assert(recalls.last > recalls.head,
      s"two rounds must strictly improve on the random seed: $recalls")
  }
}
