package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The raw-text round-trip's 1:1 line↔document contract. */
class FormatsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("fixture texts carry no embedded newlines, so lines round-trip 1:1") {
    val docs = graft.Tables(spark, sf, "documents")
    assert(docs.filter(col("text").contains("\n") || col("text").contains("\r"))
      .count() == 0L)
    val nDocs = docs.count()
    val nLines = Formats.textRoundtrip(spark, sf)
      .agg(sum("n_lines")).collect().head.getLong(0)
    assert(nLines == nDocs, s"text dump has $nLines lines for $nDocs docs")
  }
}
