package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The ladder's closed-form contract on a crafted corpus: the doc rung
  * counts exact doc duplicates, and the finer rungs measure only what
  * SURVIVES doc dedup — the duplicate doc's lines and grams must not
  * inflate them. Line/gram rungs computed by hand: docs A=XY, A (exact
  * dup, dropped), B=XZ with X a shared 12-word line → lines [X,Y,X,Z]
  * = 4 total / 3 distinct; 8-grams 17 per doc, the 5 grams wholly
  * inside X shared → 34 total / 29 distinct. */
class DedupLadderSpec extends SparkSpec {

  test("doc rung sees exact dups; finer rungs see only survivors") {
    import spark.implicits._
    def line(p: String) = (1 to 12).map(i => s"$p$i").mkString(" ")
    val a = line("x") + " " + line("y")
    val b = line("x") + " " + line("z")
    val docs = Seq((1L, a), (2L, a), (3L, b))
    val dir = graft.TempDirs.create("graft-ladder-spec").toString
    docs.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.dedupLadder(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    def r4(x: Double): Double = // HALF_UP, matching Spark's round(x, 4)
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ("doc", 3L, 2L, r4(100.0 / 3)))
    assert(got(1) == ("line", 4L, 3L, 25.0))
    assert(got(2) == ("gram8", 34L, 29L, r4(500.0 / 34)))
  }
}
