package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm2 / cosine on known vectors") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f)))
      .toDF("a", "b")
      .select(
        VectorOps.dot("a", "b").as("dot"),
        VectorOps.norm2("a").as("n2"),
        VectorOps.cosine("a", "a").as("self_cos"))
    val r = df.head()
    assert(r.getDouble(0) == 1.0 * 4 - 2 * 5 + 3 * 6)  // 12
    assert(r.getDouble(1) == 14.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
  }

  test("native codegen'd dot/norm2 are bit-identical to the higher-order-function spec") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val paired = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(emb.select(col("embedding").as("other")).limit(3))
    val r = paired.select(
      VectorOps.dot("embedding", "other").as("nat_dot"),
      VectorOps.dotSpec("embedding", "other").as("spec_dot"),
      VectorOps.norm2("embedding").as("nat_n2"),
      VectorOps.norm2Spec("embedding").as("spec_n2"))
      .collect()
    assert(r.nonEmpty)
    // bit-identical, not approximately equal: same sequential double
    // accumulation order in the generated loop and the aggregate() lambda
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1), row.toString)
      assert(row.getDouble(2) == row.getDouble(3), row.toString)
    }
  }

  test("native expressions reject non-float-array inputs at analysis time") {
    val df = Seq((Seq(1.0, 2.0), 3)).toDF("d", "i")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorOps.dot("d", "d")).head()
    }
    assert(e.getMessage.contains("graft_dot"))
  }

  test("LshBucket kernel equals the explode+planeDot bucket spec bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    for (planes <- Seq(6, 10)) {
      val nat = graft.similarity.Similarity.buckets(spark, sf, planes)
        .orderBy("vec_id").collect().toSeq
      val spec = graft.similarity.Similarity.bucketsSpec(spark, sf, planes)
        .orderBy("vec_id").collect().toSeq
      assert(nat == spec && nat.nonEmpty, s"planes=$planes")
    }
  }

  test("planeDot is exact integer arithmetic: invariant under repartitioning") {
    val vecs = (0L until 64L).map(i =>
      (i, (0 until 16).map(d => ((i * 37 + d * 11) % 13 - 6).toFloat / 7f)))
    val df = vecs.toDF("vec_id", "embedding")
    def buckets(parts: Int) = df.repartition(parts)
      .withColumn("j", explode(sequence(lit(0), lit(5))))
      .withColumn("dotj", VectorOps.planeDot("embedding", "j"))
      .groupBy("vec_id")
      .agg(sum(when(col("dotj") >= 0, expr("cast(pow(2, j) as bigint)"))
        .otherwise(0L)).as("bucket"))
      .orderBy("vec_id").collect().toSeq
    assert(buckets(1) == buckets(7))
  }
}
