package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Keep-first semantics of the C4-style line dedup (text_line_dedup):
  * exactly the first (doc_id, line_idx) occurrence of each distinct
  * 12-word line survives; every later occurrence — in a later doc OR
  * later in the same doc — is counted removed. Also pins the aligned
  * window layout: a 13-word doc is two lines (12 + 1). */
class LineDedupSpec extends SparkSpec {

  test("first occurrence kept, later occurrences removed, partial tail line") {
    import spark.implicits._
    val lineA = (1 to 12).map(i => s"a$i").mkString(" ")
    val lineB = (1 to 12).map(i => s"b$i").mkString(" ")
    val lineC = (1 to 13).map(i => s"c$i").mkString(" ") // 12 + 1 tail
    val docs = Seq(
      (1L, s"$lineA $lineB"), // A@d1.0 keeper, B@d1.1 keeper
      (2L, s"$lineA $lineA"), // both dup of d1.0
      (3L, lineC))            // 2 lines (tail "c13"), both unique
    val dir = graft.TempDirs.create("graft-linededup-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.lineDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 2L, 0L, 1.0),
      (2L, 2L, 2L, 0.0),
      (3L, 2L, 0L, 1.0)))
  }

  test("boilerplate flags EVERY occurrence once the df threshold is met") {
    import spark.implicits._
    val banner = (1 to 12).map(i => s"cookie$i").mkString(" ")
    def body(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    // banner in 3 docs (>= BoilerDf) -> flagged in ALL three, including
    // the first occurrence keep-first dedup would have kept; a line in
    // only 2 docs stays content.
    val rare = body("r")
    val docs = Seq(
      (1L, s"$banner ${body("a")}"),
      (2L, s"$banner $rare"),
      (3L, s"$banner $rare"),
      (4L, body("b")))
    val dir = graft.TempDirs.create("graft-boiler-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.boilerplate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 2L, 1L), (4L, 1L, 0L)))
  }
}
