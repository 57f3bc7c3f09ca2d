package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Directional containment semantics (dedup_containment): a short doc
  * fully quoted inside a long one scores C(short→long) = 1.0 while the
  * reverse direction stays far below the floor — the asymmetry that is
  * the operator's whole reason to exist next to Jaccard (which scores
  * this pair 3/23 and misses it entirely). */
class ContainmentSpec extends SparkSpec {

  test("quote detection fires in one direction only") {
    import spark.implicits._
    val quoted = "w1 w2 w3 w4" // 3 bigram shingles
    val host = quoted + " " + (1 to 20).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, quoted), (2L, host), (3L, "z1 z2 z3"))
    val dir = graft.TempDirs.create("graft-containment-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.containment(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.toSeq == Seq((1L, 2L, 3L, 3L, 1.0)),
      "only quoted-in-host must clear the floor; host-in-quoted and the " +
        "unrelated doc must not")
  }
}
