package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Ingestion robustness on malformed input — the posture a 100 TB
  * pipeline needs when a crawler ships broken records: PERMISSIVE mode
  * quarantines bad rows into `_corrupt_record` (the job survives and the
  * damage is countable), FAILFAST surfaces them as a hard error (the
  * job refuses to silently drop data). */
class CorruptInputSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = graft.TempDirs.create("graft-corrupt")
    Files.write(d.resolve("mixed.json"), java.util.Arrays.asList(
      """{"doc_id": 1, "text": "good row"}""",
      """{"doc_id": 2, "text": "unterminated""",
      """not json at all""",
      """{"doc_id": 3, "text": "another good row"}"""))
    d.toString
  }

  private val schema =
    "doc_id LONG, text STRING, _corrupt_record STRING"

  test("PERMISSIVE mode quarantines malformed rows into _corrupt_record") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir)
      .cache() // single-pass semantics: corrupt-record refs need the same scan
    assert(df.count() == 4)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    val good = df.filter(col("_corrupt_record").isNull)
      .select("doc_id").orderBy("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(good == Seq(1L, 3L))
    df.unpersist()
  }

  test("FAILFAST mode refuses malformed rows loudly") {
    val e = intercept[SparkException] {
      spark.read.schema("doc_id LONG, text STRING")
        .option("mode", "FAILFAST")
        .json(dir)
        .collect()
    }
    assert(e.getMessage.contains("FAILFAST") ||
      Option(e.getCause).exists(_.getMessage.contains("FAILFAST")))
  }

  test("DROPMALFORMED keeps only parseable rows") {
    val df = spark.read.schema("doc_id LONG, text STRING")
      .option("mode", "DROPMALFORMED")
      .json(dir)
    assert(df.count() == 2)
  }
}
