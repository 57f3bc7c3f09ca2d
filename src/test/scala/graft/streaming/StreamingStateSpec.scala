package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import graft.SparkSpec
import graft.ingest.FileFeeder

/** Bounded-state streaming semantics the verified queries can't show on a
  * single-batch source: append-mode watermark window closing across
  * micro-batches, and mapGroupsWithState carrying state between batches. */
class StreamingStateSpec extends SparkSpec {

  private def eventLine(ts: String, user: Long): String =
    s"""{"ts": "$ts", "user_id": $user}"""

  test("append-mode watermarked window emits only after the watermark passes its end") {
    val dir = graft.TempDirs.create("graft-append")
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:05:00Z", 1),
      eventLine("2024-01-01T10:40:00Z", 2))), prefix = "b0")

    val static = spark.read.json(dir.toString)
    val stream = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("hr"), col("cnt"))

    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("append_wm_t").start()
    try {
      q.processAllAvailable()
      // watermark = 10:40 - 10m = 10:30 < 11:00 -> hour-10 window still open
      assert(spark.table("append_wm_t").count() == 0)

      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T12:30:00Z", 3))), prefix = "b1")
      q.processAllAvailable()
      // watermark = 12:20 > 11:00 -> hour-10 window closed and emitted
      val rows = spark.table("append_wm_t")
        .select(col("hr").cast("string"), col("cnt")).collect().toSeq
      assert(rows.map(r => (r.getString(0), r.getLong(1))) ==
        Seq(("2024-01-01 10:00:00", 2L)))
    } finally q.stop()
  }

  test("hourlyAppend executes across >=3 micro-batches and matches the batch cutoff") {
    val sf = "/root/testdata/sf0.001"
    // the minDataBatches=3 contract inside hourlyAppend throws if the
    // time-split feed collapsed into fewer triggers, so a plain run IS the
    // multi-batch proof; cross-check the aggregate against batch Spark
    val streamed = StreamingOps.hourlyAppend(spark, sf)
    val wm = graft.Tables(spark, sf, "events")
      .agg(max(date_trunc("millisecond", col("ts")))).head().getTimestamp(0).getTime - 600000L
    val batch = graft.Tables(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hr"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("hr").cast("long") * 1000L + 3600000L <= wm)
    assert(streamed.count() == batch.count() && streamed.count() > 0)
  }

  test("Trigger.AvailableNow drains the pre-populated backlog across >=3 " +
      "micro-batches and TERMINATES ITSELF, emitting the same windows (r16)") {
    val sf = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val an = rows(StreamingOps.hourlyAvailableNow(spark, sf))
    // the run-mode's contract: the query ended because the trigger drained
    // the offset snapshot and stopped itself — awaitTermination returned
    // true, no drainAndStop/processAllAvailable was involved
    assert(StreamingOps.lastAvailableNowSelfTerminated,
      "AvailableNow must end via self-termination, not an external stop")
    // the backlog drained under the source's admission limit: one slice
    // per micro-batch over the 3-way feed
    assert(StreamingOps.lastAvailableNowDataBatches >= 3,
      s"expected >=3 data batches, got ${StreamingOps.lastAvailableNowDataBatches}")
    // and the run-mode changed nothing about WHAT was emitted
    val dflt = rows(StreamingOps.hourlyAppend(spark, sf))
    assert(an == dflt && an.nonEmpty,
      s"AvailableNow emitted ${an.size} rows vs default trigger's ${dflt.size}")
  }

  test("state-store metrics: watermark eviction REMOVES closed-window rows from state") {
    // The observability contract a deployment alerts on: the progress
    // feed's stateOperators must show bounded state under eviction, not
    // just a correct final table. Window state accrues while windows are
    // open, and numRowsRemoved fires when the watermark closes them.
    val dir = graft.TempDirs.create("graft-statemetrics")
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:05:00Z", 1),
      eventLine("2024-01-01T10:40:00Z", 2))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    val stream = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour")).agg(count(lit(1)).as("cnt"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("state_metrics_t").start()
    try {
      q.processAllAvailable()
      val open = q.lastProgress.stateOperators
      assert(open.nonEmpty, "a stateful agg must report a state operator")
      assert(open.head.numRowsTotal == 1L,
        s"hour-10 window open in state, got ${open.head.numRowsTotal}")

      // advance the watermark far past the open window: it must be
      // emitted AND physically evicted from the store
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T12:30:00Z", 3))), prefix = "b1")
      q.processAllAvailable()
      val after = q.recentProgress.flatMap(_.stateOperators)
      assert(after.exists(_.numRowsRemoved > 0L),
        "watermark passing a window end must record state eviction")
      assert(q.lastProgress.stateOperators.head.numRowsTotal == 1L,
        "only the new hour-12 window may remain in state")
    } finally q.stop()
  }

  test("runToMemory fails loudly when the sink exceeds the row cap") {
    val dir = graft.TempDirs.create("graft-cap")
    FileFeeder.feed(dir, Seq((1 to 10).map(i => eventLine(f"2024-01-01T10:00:$i%02dZ", i))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    val stream = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"))
    val e = intercept[IllegalStateException] {
      StreamingOps.runToMemory(spark, stream, mode = "append", maxRows = 5)
    }
    assert(e.getMessage.contains("rows > cap"))
  }

  test("dropDuplicatesWithinWatermark re-emits a key after its state expires") {
    val dir = graft.TempDirs.create("graft-ddww")
    // b0: user 1 twice within the 5-minute horizon -> one emission
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 1),
      eventLine("2024-01-01T10:01:00Z", 1))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    val deduped = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"))
      .withWatermark("ts", "5 minutes")
      .dropDuplicatesWithinWatermark("user_id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("ddww_t").start()
    try {
      q.processAllAvailable()
      // b1: another user far ahead pushes the watermark past 10:00+5m,
      // expiring user 1's dedup state
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T11:00:00Z", 99))), prefix = "b1")
      q.processAllAvailable()
      // b2: user 1 reappears past the horizon -> re-emitted, not deduped
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T11:01:00Z", 1))), prefix = "b2")
      q.processAllAvailable()
      val users = spark.table("ddww_t").groupBy("user_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // user 1: once from b0 (in-horizon dup dropped) + once from b2
      assert(users == Map(1L -> 2L, 99L -> 1L))
    } finally q.stop()
  }

  test("runToFiles carries a past-cap result through the file sink, identical rows") {
    val dir = graft.TempDirs.create("graft-filesink")
    FileFeeder.feed(dir, Seq((1 to 10).map(i => eventLine(f"2024-01-01T10:00:$i%02dZ", i))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    def stream = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"))
    // the same stream that blows the memory-sink cap above flows through
    // the file path in full: no row transits the driver
    val viaFiles = StreamingOps.runToFiles(spark, stream, mode = "append")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaFiles == (1L to 10L))
    // complete-mode parity: the overwritten parquet state equals the
    // memory-sink result for an aggregate
    def agg = stream.groupBy(col("user_id") % 2 as "par").agg(count(lit(1)).as("cnt"))
    val m = StreamingOps.runToMemory(spark, agg).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val f = StreamingOps.runToFiles(spark, agg).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(f == m && f.nonEmpty)
    // update mode stays out of scope, loudly
    intercept[IllegalArgumentException] {
      StreamingOps.runToFiles(spark, stream, mode = "update")
    }
  }

  test("flatMapGroupsWithState emits 0..n rows per group as thresholds cross") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val dir = graft.TempDirs.create("graft-fmgws")
    FileFeeder.feed(dir, Seq(
      (1 to 3).map(i => eventLine(f"2024-01-01T10:00:$i%02dZ", 7))), prefix = "b0")

    val static = spark.read.json(dir.toString)
    // emit one row each time a user's cumulative count crosses a multiple
    // of 2 — an invocation may emit zero rows (odd remainder) or several
    val milestones = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user, rows, state) =>
          val before = state.getOption.getOrElse(0L)
          val after = before + rows.size
          state.update(after)
          ((before / 2 + 1) to (after / 2)).map(m => (user, m * 2)).iterator
      }

    val q = milestones.toDF("user_id", "milestone").writeStream
      .outputMode("append").format("memory").queryName("fmgws_t").start()
    try {
      q.processAllAvailable()
      // 3 events -> milestone 2 only
      assert(spark.table("fmgws_t").as[(Long, Long)].collect().toSet == Set((7L, 2L)))
      FileFeeder.feed(dir, Seq(
        (4 to 6).map(i => eventLine(f"2024-01-01T10:00:$i%02dZ", 7))), prefix = "b1")
      q.processAllAvailable()
      // 6 events -> milestones 4 and 6 added in batch 2 (state carried: 3+3)
      assert(spark.table("fmgws_t").as[(Long, Long)].collect().toSet ==
        Set((7L, 2L), (7L, 4L), (7L, 6L)))
    } finally q.stop()
  }

  test("foreachBatch writes each micro-batch idempotently by batchId") {
    val dir = graft.TempDirs.create("graft-feb")
    val out = graft.TempDirs.create("graft-feb-out").toString
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 1),
      eventLine("2024-01-01T10:01:00Z", 2))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    val q = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"))
      .writeStream
      // the transactional-sink pattern: each batch lands in its own
      // overwrite-mode directory, so replaying a batch after a failure
      // REPLACES its output instead of duplicating it
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        df.write.mode("overwrite").parquet(s"$out/batch_$id")
      }
      .start()
    try {
      q.processAllAvailable()
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T10:02:00Z", 3))), prefix = "b1")
      q.processAllAvailable()
    } finally q.stop()
    val batchDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_"))
    assert(batchDirs.length >= 2, s"expected >=2 batch dirs, got ${batchDirs.toSeq}")
    val total = batchDirs.map(d => spark.read.parquet(d.toString).count()).sum
    assert(total == 3)
    // idempotent replay: rewriting a batch's directory replaces, not appends
    val replay = spark.read.parquet(batchDirs.head.toString)
    replay.write.mode("overwrite").parquet(batchDirs.head.toString + "_re")
    assert(spark.read.parquet(batchDirs.head.toString + "_re").count() == replay.count())
  }

  test("a restarted query resumes from its checkpoint exactly-once") {
    val dir = graft.TempDirs.create("graft-restart")
    val cp = graft.TempDirs.create("graft-restart-cp").toString
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 1),
      eventLine("2024-01-01T10:01:00Z", 2))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    def counts() = spark.readStream.schema(static.schema).json(dir.toString)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))

    val q1 = counts().writeStream.outputMode("complete")
      .option("checkpointLocation", cp)
      .format("memory").queryName("restart_t1").start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(spark.table("restart_t1").count() == 2)

    // new data lands while the query is DOWN; the restarted query must
    // recover its aggregation state from the checkpoint and process only
    // the unseen file (exactly-once: no double counting of b0)
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:02:00Z", 1))), prefix = "b1")
    val q2 = counts().writeStream.outputMode("complete")
      .option("checkpointLocation", cp)
      .format("memory").queryName("restart_t2").start()
    try {
      q2.processAllAvailable()
      val rows = spark.table("restart_t2")
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(rows == Seq((1L, 2L), (2L, 1L)))
      // the resumed run ingested ONLY the new file's rows
      assert(q2.recentProgress.map(_.numInputRows).sum == 1)
    } finally q2.stop()
  }

  test("mapGroupsWithState carries per-key state across micro-batches") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-mgws")
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 7),
      eventLine("2024-01-01T10:01:00Z", 7),
      eventLine("2024-01-01T10:02:00Z", 8))), prefix = "b0")

    val static = spark.read.json(dir.toString)
    val counts = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout()) {
        case (user, rows, state) =>
          val c = state.getOption.getOrElse(0L) + rows.size
          state.update(c)
          (user, c)
      }

    val q = counts.toDF("user_id", "cnt").writeStream
      .outputMode("update").format("memory").queryName("mgws_t").start()
    try {
      q.processAllAvailable()
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T10:03:00Z", 7))), prefix = "b1")
      q.processAllAvailable()
      // batch 2 re-emits only user 7, with state 2+1=3
      val last = spark.table("mgws_t")
        .groupBy("user_id").agg(max("cnt").as("cnt"))
        .orderBy("user_id").as[(Long, Long)].collect().toSeq
      assert(last == Seq((7L, 3L), (8L, 1L)))
    } finally q.stop()
  }

  test("transformWithState carries named ValueState across micro-batches") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-tws")
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 7),
      eventLine("2024-01-01T10:01:00Z", 7),
      eventLine("2024-01-01T10:02:00Z", 8))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    // the new API supports only the RocksDB state store provider
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val summaries = spark.readStream.schema(static.schema).json(dir.toString)
        .select(col("user_id"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .transformWithState(new SummaryProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Update())
      val q = summaries.toDF().writeStream
        .outputMode("update").format("memory").queryName("tws_t").start()
      try {
        q.processAllAvailable()
        FileFeeder.feed(dir, Seq(Seq(
          eventLine("2024-01-01T10:03:00Z", 7))), prefix = "b1")
        q.processAllAvailable()
        // batch 2 re-emits only user 7: count 2+1=3 AND the running
        // min/max span BOTH batches (state, not per-batch recompute)
        val last = spark.table("tws_t")
          .groupBy("user_id").agg(max("n_events").as("n"),
            min("first_us").as("lo"), max("last_us").as("hi"))
          .orderBy("user_id").as[(Long, Long, Long, Long)].collect().toSeq
        def us(s: String) = java.time.Instant.parse(s).toEpochMilli * 1000L
        assert(last == Seq(
          (7L, 3L, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:03:00Z")),
          (8L, 1L, us("2024-01-01T10:02:00Z"), us("2024-01-01T10:02:00Z"))))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set(providerKey, p)
      case None => spark.conf.unset(providerKey)
    }
  }

  test("statestore reader: the pinned buffer layout holds — value struct is " +
      "exactly one LongType field (state format v2, single count buffer)") {
    // VERDICT r13 #5: stateReader selects the aggregation buffer from the
    // value struct under a require on (arity, type). This spec re-derives
    // the same checkpoint shape independently, so a Spark upgrade that
    // changes the state data source's buffer layout fails HERE with the
    // layout it actually found — a named drift, not a hash mismatch.
    import org.apache.spark.sql.types.{LongType, StructType}
    val ckpt = graft.TempDirs.create("graft-state-pin").toString
    val q = graft.streaming.StreamingOps.eventStream(spark, "/root/testdata/sf0.001")
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete").format("noop")
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    val raw = spark.read.format("statestore").load(ckpt)
    val value = raw.schema("value").dataType.asInstanceOf[StructType]
    assert(value.fields.length == 1 && value.fields.head.dataType == LongType,
      s"state-store buffer layout drifted: ${value.simpleString} — update " +
        "StreamingOps.stateReader's pinned assumption alongside this spec")
    // the key struct carries the group column by NAME — the explicit
    // key.event_type selection stateReader makes is resolvable
    val key = raw.schema("key").dataType.asInstanceOf[StructType]
    assert(key.fieldNames.contains("event_type"), key.simpleString)
  }

  test("statestore reader: checkpoint state equals the stream's own emission") {
    val dir = "/root/testdata/sf0.001"
    // the state files read back by format(\"statestore\") must carry
    // exactly what the complete-mode stream emitted — the ops tool and
    // the job can never disagree about what the job's state holds
    val fromState = graft.streaming.StreamingOps.stateReader(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val fromStream = graft.streaming.StreamingOps.completeCounts(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(fromState == fromStream)
    assert(fromState.nonEmpty)
  }

  test("transformWithState timers: sessions close by BOTH paths — inline on " +
      "the successor's arrival AND by event-time timer at the watermark") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.streaming.StreamingOps.twsTimerSessions(spark, dir).collect()
    assert(got.nonEmpty)
    // per-user final sessions can ONLY be emitted by the timer path (no
    // successor ever arrives to close them inline); the gap rule says a
    // final session emits iff max-event-time passes its end + 12 h. The
    // fixture spans 30 days of ~7.7 h-median gaps, so both outcomes exist:
    import org.apache.spark.sql.functions._
    val e = graft.Tables(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"))
    val maxT = e.agg(max("t")).collect()(0).getLong(0)
    val lastPerUser = e.groupBy("user_id").agg(max("t").as("lastT")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gap = 12L * 3600L * 1000000L
    val timerClosed = lastPerUser.filter { case (_, t) =>
      (t + gap) / 1000L <= maxT / 1000L }
    assert(timerClosed.nonEmpty, "no user's final session was timer-eligible")
    assert(timerClosed.size < lastPerUser.size,
      "every final session closed — the still-open path is untested")
    // every timer-eligible final session IS in the emitted set (the row
    // whose last_us equals that user's max event time), and no
    // still-open session leaked
    val emittedFinals = got.filter(r => lastPerUser(r.getLong(0)) == r.getLong(3))
      .map(_.getLong(0)).toSet
    assert(emittedFinals == timerClosed.keySet,
      s"timer emissions diverge: emitted ${emittedFinals.size}, " +
        s"eligible ${timerClosed.size}")
    // and inline closes exist too: more sessions than timer emissions
    assert(got.length > emittedFinals.size)
  }

  test("transformWithState ListState AND registered timers survive a " +
      "checkpoint restart exactly-once") {
    twsRestartRoundtrip(changelog = false)
  }

  test("under RocksDB changelog checkpointing the checkpoint carries " +
      ".changelog deltas and a restart recovers from them (r15)") {
    val cp = twsRestartRoundtrip(changelog = true)
    // the state reached the checkpoint as per-commit CHANGELOG deltas,
    // not (only) full SST snapshots — the 100 TB upload-cost shape
    val walk = java.nio.file.Files.walk(java.nio.file.Paths.get(cp, "state"))
    val changelogs =
      try walk.filter(p => p.toString.endsWith(".changelog")).count()
      finally walk.close()
    assert(changelogs > 0,
      "changelog checkpointing enabled but no .changelog files in the " +
        "state checkpoint — full snapshots were uploaded instead")
  }

  /** The ListState+timer restart scenario, parameterized by changelog
    * checkpointing (round 15, VERDICT r14 #4): emissions must be
    * IDENTICAL either way — the checkpoint format changes how state is
    * uploaded, never what is recovered. Returns the checkpoint dir so
    * the changelog variant can inspect the state files. */
  private def twsRestartRoundtrip(changelog: Boolean): String = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val dir = graft.TempDirs.create("graft-tws-restart")
    val cp = graft.TempDirs.create("graft-tws-restart-cp").toString
    val gapUs = 30L * 60L * 1000000L // 30-minute session gap
    // slice A: user 1 has an OPEN 2-event session (timer at 10:35),
    // user 2 an open 1-event session (timer at 10:31)
    FileFeeder.feed(dir, Seq(Seq(
      eventLine("2024-01-01T10:00:00Z", 1),
      eventLine("2024-01-01T10:05:00Z", 1),
      eventLine("2024-01-01T10:01:00Z", 2))), prefix = "b0")
    val static = spark.read.json(dir.toString)
    def sessions() = spark.readStream.schema(static.schema).json(dir.toString)
      .select(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "0 seconds")
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new GapSessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val changelogKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prevProvider = spark.conf.getOption(providerKey)
    val prevChangelog = spark.conf.getOption(changelogKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    if (changelog) spark.conf.set(changelogKey, "true")
    try {
      // the memory sink rejects checkpoint recovery; foreachBatch is the
      // recoverable sink, collecting emissions into a driver-side buffer
      val emitted = new scala.collection.concurrent.TrieMap[(Long, Long, Long), Long]()
      def start() = sessions().writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          b.collect().foreach(r => emitted.put(
            (r.getLong(0), r.getLong(2), r.getLong(3)), r.getLong(1)))
        }
        .option("checkpointLocation", cp).start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // nothing closes in run 1: both timers sit past the 10:05 watermark
      assert(emitted.isEmpty, s"premature emissions: $emitted")

      // while the query is DOWN: user 1's next event lands past the gap
      // (must close the RECOVERED 2-event session inline), and user 3's
      // late-day event pushes the watermark past both pending timers
      FileFeeder.feed(dir, Seq(Seq(
        eventLine("2024-01-01T12:00:00Z", 1),
        eventLine("2024-01-01T13:30:00Z", 3))), prefix = "b1")
      val q2 = start()
      try {
        q2.processAllAvailable()
        val got = emitted.toSeq
          .sortBy { case ((u, first, _), _) => (u, first) }
          .map { case ((u, _, _), n) => (u, n) }
        // user 1 session 1: BOTH pre-restart events — ListState recovered
        //   from the checkpoint, closed inline by the 12:00 arrival;
        // user 1 session 2 (12:00) + user 2 session (10:01): closed by
        //   TIMERS registered before/after the restart — the timer set
        //   recovered from the checkpoint and fired at watermark 13:30;
        // user 3: still open (timer 14:00 > watermark), withheld
        assert(got == Seq((1L, 2L), (1L, 1L), (2L, 1L)),
          s"restart emissions diverged: $got")
        // exactly-once: the resumed run ingested ONLY the new file
        assert(q2.recentProgress.map(_.numInputRows).sum == 2)
      } finally q2.stop()
    } finally {
      prevProvider match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
      prevChangelog match {
        case Some(v) => spark.conf.set(changelogKey, v)
        case None => spark.conf.unset(changelogKey)
      }
    }
    cp
  }
}
