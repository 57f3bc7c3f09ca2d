package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scene-cut semantics (mm_scene_cuts) on payloads with known frame
  * fingerprints: a constant 100-byte frame average-hashes to all-ones
  * (every sample equals the mean), a frame whose last sample towers over
  * 47 equal ones sets exactly one bit — Hamming 47 between them, far
  * above the 24-bit threshold — while identical consecutive frames sit
  * at Hamming 0. Single-frame assets report a NULL max jump. */
class SceneCutsSpec extends SparkSpec {

  test("cuts fire on fingerprint jumps, not on identical frames") {
    import spark.implicits._
    val flat = "a" * 100                 // all-ones fingerprint
    val spike = "a" * 99 + "~"           // one-bit fingerprint (last sample wins)
    val docs = Seq(
      (1L, flat + spike + flat), // jumps 47, 47 -> 2 cuts
      (2L, "b" * 200),           // identical frames -> 0 cuts, max 0
      (3L, "c" * 50))            // single frame -> no pair, NULL max
    val dir = graft.TempDirs.create("graft-scenecuts-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.sceneCuts(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))
    assert(got.toSeq == Seq((1L, 3L, 2L, 47), (2L, 2L, 0L, 0), (3L, 1L, 0L, -1)))
  }
}
