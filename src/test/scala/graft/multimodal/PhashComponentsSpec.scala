package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cluster semantics of mm_phash_components on a crafted corpus: equal
  * payloads land on Hamming-0 pHash pairs, so three copies collapse to
  * one cluster of 3 (rep = min id), two copies of another payload to a
  * cluster of 2, and a unique asset to no cluster at all. (The fixture
  * only produces fingerprint pairs at sf0.1 — 8 pairs, oracle-gated;
  * this pins the grouping mechanics at any scale.) */
class PhashComponentsSpec extends SparkSpec {

  test("copies cluster under their min-id representative; singletons absent") {
    import spark.implicits._
    val t1 = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val t2 = (1 to 40).map(i => s"beta$i").mkString(" ")
    val docs = Seq((1L, t1), (2L, t1), (3L, t1), (10L, t2), (11L, t2),
      (20L, (1 to 40).map(i => s"gamma$i").mkString(" ")))
    val dir = graft.TempDirs.create("graft-phashcomp-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashComponents(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((1L, 3L), (10L, 2L)))
  }
}
