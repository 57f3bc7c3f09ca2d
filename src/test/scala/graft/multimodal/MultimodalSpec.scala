package graft.multimodal

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The typed partition-wise decode path and the columnar verified path
  * must agree record-for-record — swapping in a real codec later may not
  * silently change the contract. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decodeTyped equals the columnar mediaMeta on the sf0.001 documents") {
    val dir = "/root/testdata/sf0.001"
    val media = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    val typed = Multimodal.decodeTyped(media).orderBy("doc_id").collect().toSeq
    val columnar = Multimodal.mediaMeta(spark, dir)
      .as[MediaMeta].collect().toSeq
    assert(typed == columnar)
    assert(typed.nonEmpty)
  }

  test("stub decode: non-ASCII payloads measure UTF-8 bytes, not characters") {
    val r = Seq((1L, "😀")).toDF("doc_id", "text")
      .select(length(col("text").cast("binary")).cast("long").as("n"))
      .head()
    assert(r.getLong(0) == 4L)  // U+1F600 is 4 UTF-8 bytes
  }
}
