package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.emoji.EmojiOps
import graft.ingest.FileFeeder

/** The reference's static/stream duality (SURVEY.md §5.4, q2:95-97) as an
  * executable assertion: NDJSON rotated into a directory by FileFeeder
  * (tmp-file + atomic rename, reference S4 protocol), aggregated once via
  * the file-stream source in complete mode into a memory sink, once via a
  * plain batch read — identical results required. */
class StreamingDualitySpec extends SparkSpec {

  test("complete-mode streaming aggregate equals batch recomputation over the same files") {
    val dir = graft.TempDirs.create("graft-duality")
    val lines = Seq(
      Seq("""{"text": "hello 😀 world"}""",
          """{"text": "😀😀 glued 🔥"}"""),
      Seq("""{"text": "no emoji"}""",
          """{"text": "🔥 and 🙏"}"""),
      Seq("""{"text": "😀 again"}"""))
    val written = FileFeeder.feed(dir, lines)
    assert(written.size == 3)
    assert(written.forall(p => p.getFileName.toString.matches("feed-\\d{5}\\.json")))

    val static = spark.read.json(dir.toString)
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(EmojiOps.extractEmojis(col("text"))).as("emoji"))
      .groupBy("emoji").agg(count(lit(1)).as("cnt"))

    val stream = spark.readStream.schema(static.schema).json(dir.toString)
    val q = agg(stream).writeStream
      .outputMode("complete").format("memory").queryName("duality_t").start()
    try q.processAllAvailable()
    finally q.stop()

    val streamed = spark.table("duality_t").orderBy("emoji").collect().toSeq
    val batch = agg(static).orderBy("emoji").collect().toSeq
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // 😀: 4 occurrences across files (incl. inside the glued run)
    assert(streamed.map(r => r.getString(0) -> r.getLong(1)).toMap.apply("😀") == 4L)
  }

  test("online CMS sketch equals the batch sketch and its cells sum to d x corpus") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingOps.cmsSketch(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    // batch recomputation of the identical sketch over the static table
    val d = graft.text.TextAnalysis.CmsDepth
    val w = graft.text.TextAnalysis.CmsWidth
    val events = graft.Tables(spark, sf, "events")
    val batch = events
      .select(col("event_type"), explode(expr(s"sequence(0, ${d - 1})")).as("i"))
      .select(col("i"),
        (expr("conv(substring(md5(concat(i, ':', event_type)), 1, 4), 16, 10)")
          .cast("long") % w).as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))
      .orderBy("i", "b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch && streamed.nonEmpty)
    // every row of the sketch sees the whole stream: per-row cell sums
    // all equal the corpus size (the CMS invariant that makes the
    // min-over-rows estimate one-sided)
    val n = events.count()
    streamed.groupBy(_._1).values.foreach(cells => assert(cells.map(_._3).sum == n))
    // fixed-memory bound: at most d*w cells ever exist
    assert(streamed.size <= d * w)
  }

  test("carried-state streaming transition matrix equals the batch lead() window") {
    val sf = "/root/testdata/sf0.001"
    val streamed = StreamingOps.streamPaths(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    val batch = graft.queries.EventQueries.paths(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    // the fold's cross-trigger carry must reproduce the batch window
    // exactly — any dropped or doubled boundary transition shifts a count
    assert(streamed == batch && streamed.nonEmpty)
  }
}
