package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Engine, Tables}

/** A record carrying an opaque binary media payload plus typed metadata —
  * the multimodal-column pattern: media stays an opaque `binary` column,
  * decode/feature-extraction runs partition-wise over typed batches. */
case class MediaRecord(doc_id: Long, payload: Array[Byte])

/** Decoded (stubbed) media metadata. */
case class MediaMeta(doc_id: Long, byte_len: Long, width: Long, height: Long, fmt: String)

/** Multimodal-column plumbing for the training-data-pipeline superset.
  *
  * Real image/audio codecs are not available in this container, so
  * [[Multimodal.decodeStub]] is a clearly-marked deterministic fake. The
  * Spark-side plumbing is real: binary column in the schema, typed
  * `Dataset[MediaRecord]`, partition-wise batch iteration (`mapPartitions`,
  * the JVM analog of an Arrow-batched Python UDF), and a relational
  * metadata result that joins back by key. Swapping the stub for a real
  * decoder changes no plan shape.
  */
object Multimodal {

  /** STUB decode: deterministic metadata derived from the payload bytes.
    * A real implementation would parse the container header (PNG IHDR,
    * JPEG SOF0, ...) here. */
  def decodeStub(payload: Array[Byte]): MediaMeta0 = {
    val n = payload.length.toLong
    val fmt = (n % 3) match {
      case 0 => "png"
      case 1 => "jpg"
      case _ => "webp"
    }
    MediaMeta0(n, 64L + n % 577L, 64L + (n * 31L) % 417L, fmt)
  }

  case class MediaMeta0(byte_len: Long, width: Long, height: Long, fmt: String)

  /** documents.text cast to a binary payload column → typed decode →
    * per-media metadata. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    Engine.tune(spark)
    import spark.implicits._
    val media: Dataset[MediaRecord] = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[MediaRecord]
    media
      .mapPartitions { it =>
        it.map { r =>
          val m = decodeStub(r.payload)
          MediaMeta(r.doc_id, m.byte_len, m.width, m.height, m.fmt)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_meta" -> (mediaMeta _))

  /** Oracle mirrors the stub arithmetic on the (ASCII) text length. */
  val oracles: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id,
        |  CAST(length(text) AS BIGINT) AS byte_len,
        |  64 + CAST(length(text) AS BIGINT) % 577 AS width,
        |  64 + (CAST(length(text) AS BIGINT) * 31) % 417 AS height,
        |  CASE CAST(length(text) AS BIGINT) % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpg' ELSE 'webp' END AS fmt
        |FROM documents ORDER BY doc_id""".stripMargin)
}
