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

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdrLen = Array(0, 0, 0, 13)
    val ihdr = "IHDR".getBytes("US-ASCII").map(_.toInt)
    def be32(v: Int) = Array(v >>> 24, (v >>> 16) & 0xff, (v >>> 8) & 0xff, v & 0xff)
    // bit depth, color type, compression, filter, interlace
    val tail = Array(8, 2, 0, 0, 0)
    (sig ++ ihdrLen ++ ihdr ++ be32(w) ++ be32(h) ++ tail).map(_.toByte)
  }

  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    def be16(v: Int) = Array(v >>> 8, v & 0xff)
    val soi = Array(0xff, 0xd8)
    // APP0 "JFIF" segment the scanner must walk over
    val app0 = Array(0xff, 0xe0) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII").map(_.toInt) ++ Array(0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    // DQT stub segment (length 4: just the length field + 2 filler bytes)
    val dqt = Array(0xff, 0xdb) ++ be16(4) ++ Array(0, 0)
    // SOF0: precision 8, then height, width, 3 components (truncated fine)
    val sof0 = Array(0xff, 0xc0) ++ be16(17) ++ Array(8) ++ be16(h) ++ be16(w) ++
      Array(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    (soi ++ app0 ++ dqt ++ sof0).map(_.toByte)
  }

  test("parseImageHeader reads real dimensions from real PNG/JPEG header bytes") {
    assert(Multimodal.parseImageHeader(pngBytes(640, 480))
      .map(m => (m.width, m.height, m.fmt)) == Some((640L, 480L, "png")))
    assert(Multimodal.parseImageHeader(jpegBytes(1920, 1080))
      .map(m => (m.width, m.height, m.fmt)) == Some((1920L, 1080L, "jpg")))
    // a 16k-wide panorama exercises the full u16 range
    assert(Multimodal.parseImageHeader(jpegBytes(65535, 1))
      .map(m => (m.width, m.height)) == Some((65535L, 1L)))
    assert(Multimodal.parseImageHeader("not an image".getBytes) == None)
    assert(Multimodal.parseImageHeader(Array[Byte]()) == None)
  }

  test("parseImageHeader tolerates 0xFF fill bytes and short non-SOF tails") {
    def be16(v: Int) = Array(v >>> 8, v & 0xff)
    // spec-legal fill: a run of 0xFF padding bytes before each marker
    val filled = (Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xe0) ++ be16(4) ++
      Array(0, 0) ++ Array(0xff, 0xff, 0xc0) ++ be16(17) ++ Array(8) ++
      be16(240) ++ be16(320) ++ Array(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)).map(_.toByte)
    assert(Multimodal.parseImageHeader(filled)
      .map(m => (m.width, m.height, m.fmt)) == Some((320L, 240L, "jpg")))
    // a truncated file ending right after a short APP0 must walk (then give
    // up cleanly), not trip the old 10-trailing-byte loop guard
    val truncated = (Array(0xff, 0xd8, 0xff, 0xe0) ++ be16(4) ++ Array(0, 0)).map(_.toByte)
    assert(Multimodal.parseImageHeader(truncated) == None)
    // entropy-coded data after SOS must never be scanned for markers
    val sosFirst = (Array(0xff, 0xd8, 0xff, 0xda) ++ be16(4) ++ Array(0, 0) ++
      Array(0xff, 0xc0) ++ be16(17) ++ Array(8) ++ be16(1) ++ be16(1)).map(_.toByte)
    assert(Multimodal.parseImageHeader(sosFirst) == None)
  }

  test("decodeHeaders parses real payloads and falls back to the stub for opaque ones") {
    val media = Seq(
      MediaRecord(1L, pngBytes(320, 200)),
      MediaRecord(2L, jpegBytes(800, 600)),
      MediaRecord(3L, "plain text payload".getBytes)).toDS()
    val out = Multimodal.decodeHeaders(media).orderBy("doc_id").collect().toSeq
    assert(out(0).width == 320L && out(0).height == 200L && out(0).fmt == "png")
    assert(out(1).width == 800L && out(1).height == 600L && out(1).fmt == "jpg")
    val stub = Multimodal.decodeStub("plain text payload".getBytes)
    assert(out(2) == MediaMeta(3L, stub.byte_len, stub.width, stub.height, stub.fmt))
  }

  test("parseImageHeader reads committed real-file fixtures (round 13)") {
    // fixtures/media holds REAL container bytes committed to the repo: a
    // fully valid zlib-compressed 3x2 RGB PNG and a baseline-JPEG header
    // stream (SOI→APP0→DQT→SOF0→DHT→SOS→EOI). The parser must read the
    // dimensions out of genuine files, not just the spec's hand-rolled
    // byte arrays.
    val png = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/media/rgb_3x2.png"))
    assert(Multimodal.parseImageHeader(png)
      .map(m => (m.width, m.height, m.fmt)) == Some((3L, 2L, "png")))
    val jpg = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/media/gray_5x4.jpg"))
    assert(Multimodal.parseImageHeader(jpg)
      .map(m => (m.width, m.height, m.fmt)) == Some((5L, 4L, "jpg")))
  }

  test("header census equals the per-doc decode rolled up; real parse ≠ stub") {
    val dir = "/root/testdata/sf0.001"
    val census = Multimodal.mediaHeaderCensus(spark, dir)
    val rolled = Multimodal.mediaHeaders(spark, dir)
      .groupBy(col("fmt"), floor(col("width") / lit(100)).as("w_bucket"))
      .agg(count(lit(1)).as("n"),
        min("width").as("min_w"), max("width").as("max_w"),
        min("height").as("min_h"), max("height").as("max_h"),
        sum("byte_len").as("bytes"))
    assert(census.exceptAll(rolled).isEmpty && rolled.exceptAll(census).isEmpty)
    // the registered path must be exercising the REAL parser: for image
    // payloads (doc_id % 3 < 2) the parsed dims come from header bytes and
    // disagree with what the stub would fabricate from the byte length
    val perDoc = Multimodal.mediaHeaders(spark, dir)
      .filter(col("doc_id") % 3 < 2).collect()
    assert(perDoc.nonEmpty)
    val stubDisagrees = perDoc.count { r =>
      val stub = Multimodal.decodeStub(
        Multimodal.synthesizeHeader(r.getLong(0)))
      stub.width != r.getLong(2) || stub.height != r.getLong(3)
    }
    assert(stubDisagrees > 0, "real parse must not be reproducible by the stub")
  }

  test("stub decode: non-ASCII payloads measure UTF-8 bytes, not characters") {
    val r = Seq((1L, "😀")).toDF("doc_id", "text")
      .select(length(col("text").cast("binary")).cast("long").as("n"))
      .head()
    assert(r.getLong(0) == 4L)  // U+1F600 is 4 UTF-8 bytes
  }

  test("aHash native kernel is row-identical to the HOF spelling (incl. non-ASCII)") {
    val sf = "/root/testdata/sf0.001"
    val nat = Multimodal.mediaAhash(spark, sf).select("doc_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val spec = Multimodal.mediaAhashSpec(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nat == spec && nat.nonEmpty)
    // supplementary code points: the kernel must sample CODE POINTS like
    // Spark's length/substring/ascii, not UTF-16 units
    val d = graft.TempDirs.create("graft-ahash-nn").toString
    Seq((1L, "😀a😀b😀c😀d", "en", "s", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val nn = Multimodal.mediaAhash(spark, d).select("doc_id", "ahash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nnSpec = Multimodal.mediaAhashSpec(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(nn == nnSpec)
  }

  test("aHash: uniform payload saturates, duplicates collide and count") {
    val d = graft.TempDirs.create("graft-ahash").toString
    Seq(
      (1L, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "en", "s", 50L),
      (2L, "the quick brown fox jumps over the lazy dog tonight", "en", "s", 51L),
      (3L, "the quick brown fox jumps over the lazy dog tonight", "en", "s", 51L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = Multimodal.mediaAhash(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val byDoc = r.map(x => x._1 -> x).toMap
    // uniform samples: every v equals the mean, so every bit sets
    assert(byDoc(1L)._2 == (1L << Multimodal.AhashBits) - 1)
    // identical payloads are perceptual-equal and counted together
    assert(byDoc(2L)._2 == byDoc(3L)._2 && byDoc(2L)._3 == 2L)
    assert(byDoc(1L)._2 != byDoc(2L)._2)
  }

  test("mm_phash_topk plans the bounded-heap TopKPerGroup, not a window sort") {
    val plan = Multimodal.mediaPhashTopK(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"),
      "per-probe ranking must not sort corpus-sized probe partitions")
  }

  test("mediaEmbed batching: fixed-size model calls, full batches until the partition tail") {
    import spark.implicits._
    val n = 70
    val sizes = spark.sparkContext.collectionAccumulator[Integer]("batchSizes")
    val media = (1 to n).map(i => MediaRecord(i.toLong, Array.fill(i)(7: Byte)))
      .toDS().repartition(1)
    val out = Multimodal.embedPartitions(media, s => sizes.add(s)).collect()
    // ceil(70/32) = 3 model calls on one partition: 32, 32, 6
    val got = sizes.value
    assert(got.size == 3 && got.stream.mapToInt(_.toInt).sum == n)
    assert(got.stream.allMatch(s => s <= Multimodal.EmbedBatch))
    // every record came back with the stub checksum, batch-independent
    assert(out.length == n && out.forall(o =>
      o.checksum == Multimodal.embedStub(o.byte_len).sum))
  }

  test("mm_phash_served: the persisted fingerprint index serves row-for-row the inline search") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    val inline = rows(Multimodal.mediaPhashTopK(spark, sf))
    val served = rows(Multimodal.mediaPhashServed(spark, sf))
    assert(served == inline && served.nonEmpty)
  }
}
