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
}
