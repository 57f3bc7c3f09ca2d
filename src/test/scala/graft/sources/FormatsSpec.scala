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

  test("zstd round-trip really writes zstd part files") {
    // run the registered query first so the artifact exists
    assert(Formats.zstdRoundtrip(spark, sf).count() > 0)
    val tag = sf.replaceAll("[^A-Za-z0-9.]", "_") // Formats.sfTag's spelling
    val parts = Option(new java.io.File(s"/tmp/graft-src-zstd-$tag")
      .listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty, "no part files written")
    assert(parts.forall(_.getName.endsWith(".zstd.parquet")),
      s"codec option silently ignored: ${parts.map(_.getName).toSeq}")
  }

  test("compaction collapses the 64-file fragment layout by >=8x, keeping rows") {
    val (frag, out) = Formats.compactionDirs(spark, sf)
    def parts(d: String): Int = Option(new java.io.File(d).listFiles())
      .getOrElse(Array.empty)
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    val (nFrag, nOut) = (parts(frag), parts(out))
    assert(nFrag == 64, s"fragment layout has $nFrag files")
    assert(nOut * 8 <= nFrag, s"compacted to $nOut files from $nFrag")
    assert(spark.read.parquet(out).count() == spark.read.parquet(frag).count())
  }
}
