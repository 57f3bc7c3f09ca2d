package graft

import java.util.concurrent.atomic.AtomicBoolean

import graft.streaming.StreamingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Failure-injection hardening (round 13, carried from r11 #8): a task
  * killed mid-query must retry to the IDENTICAL result, and the
  * foreachBatch MERGE sink — the library's one at-least-once surface —
  * must absorb a replayed batch as a no-op. */
object ChaosBomb {
  // test JVM is one process (local mode), so a static flag is visible to
  // executor threads; the first task attempt to claim the bomb throws
  val fired = new AtomicBoolean(false)
}

class ChaosSpec extends SparkSpec {
  import spark.implicits._

  test("an injected task failure retries to the identical result") {
    // TestSpark runs local[4, 2]: maxFailures=2, one retry per task
    ChaosBomb.fired.set(false)
    val base = spark.range(0, 100000, 1, 8).toDF("id")
    val bombed = base.as[Long].mapPartitions { it =>
      if (!ChaosBomb.fired.getAndSet(true))
        throw new RuntimeException("chaos: injected task failure")
      it
    }.toDF("id")
    def census(df: DataFrame) = df
      .groupBy((col("id") % 7).as("k"))
      .agg(count(lit(1)).as("n"), sum("id").as("s"))
      .orderBy("k").collect().toSeq
    val got = census(bombed)
    assert(ChaosBomb.fired.get(), "the bomb must actually have fired")
    assert(got == census(base),
      "the retried computation must be indistinguishable from an unfailed one")
  }

  test("a deterministic failure still fails (retries don't mask real bugs)") {
    val ex = intercept[Exception] {
      spark.range(0, 100, 1, 2).as[Long]
        .map(i => if (i == 50L) throw new IllegalStateException("real bug") else i)
        .count()
    }
    assert(ex.getMessage != null)
  }

  private def events(rows: (Long, String, Long, Long, Long)*): DataFrame =
    rows.toSeq.toDF("user_id", "event_type", "value", "ts_l", "event_id")
      .select(col("user_id"), col("event_type"), col("value"),
        timestamp_micros(col("ts_l")).as("ts"), col("event_id"))

  private def sorted(df: DataFrame) =
    df.orderBy("user_id").collect().toSeq

  test("MERGE sink: a replayed batch re-applies as a no-op (at-least-once safety)") {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      events().schema)
    val b1 = StreamingOps.latestPerKey(events(
      (1L, "click", 10L, 100L, 1L),
      (1L, "view", 20L, 200L, 2L),   // newer → wins within the batch
      (2L, "click", 30L, 150L, 3L)))
    val once = StreamingOps.mergeClassify(empty, b1)
    // foreachBatch crashed after the sink committed, before the checkpoint:
    // the SAME batch replays against the target that already absorbed it
    val twice = StreamingOps.mergeClassify(
      StreamingOps.targetAsEvents(once), b1)
    assert(sorted(twice) == sorted(once),
      "re-delivery must be a no-op: strictly-newer can't fire twice for one row")
  }

  test("MERGE sink: shuffled batch order converges to the same final state") {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      events().schema)
    val b1 = StreamingOps.latestPerKey(events(
      (1L, "click", 10L, 100L, 1L), (2L, "view", 20L, 300L, 4L)))
    val b2 = StreamingOps.latestPerKey(events(
      (1L, "buy", 99L, 250L, 2L), (3L, "click", 5L, 50L, 3L)))
    def apply(target: DataFrame, b: DataFrame) =
      StreamingOps.mergeClassify(StreamingOps.targetAsEvents(target), b)
    val fwd = apply(StreamingOps.mergeClassify(empty, b1), b2)
    val rev = apply(StreamingOps.mergeClassify(empty, b2), b1)
    assert(sorted(fwd) == sorted(rev),
      "CDC order must not matter: the per-key argmax is the fixed point")
    // and the winner per key is the greater (ts, event_id), not arrival order
    val u1 = sorted(fwd).find(_.getLong(0) == 1L).get
    assert(u1.getString(1) == "buy", s"user 1 must keep the ts=250 row, got $u1")
  }

  test("file sink: a replayed append batch rewrites itself, never duplicates") {
    val out = graft.TempDirs.create("chaos-filesink").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b1 = Seq((3L, "c")).toDF("id", "s")
    StreamingOps.writeBatchIdempotent(out, b0, 0L, complete = false)
    StreamingOps.writeBatchIdempotent(out, b1, 1L, complete = false)
    // at-least-once: batch 1 replays after a crash between write and
    // checkpoint commit — it must overwrite its own directory, not append
    StreamingOps.writeBatchIdempotent(out, b1, 1L, complete = false)
    val got = StreamingOps.readBatchDirs(spark, out)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "b"), (3L, "c")),
      s"replay must be a no-op, got $got")
  }

  test("a commit whose build throws leaves the published snapshot untouched") {
    import graft.similarity.IndexStore
    val name = "chaos_commit"
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(IndexStore.Root, name))
    IndexStore.commit(name, "good")(Seq((1L, 1L)).toDF("id", "v"))
    def state() = IndexStore.readCurrent(spark, name)
      .orderBy("id").collect().toSeq
    val before = state()
    intercept[RuntimeException] {
      IndexStore.commit(name, "bad") {
        throw new RuntimeException("chaos: build died mid-commit")
      }
    }
    assert(state() == before,
      "a failed build must never move the published link")
  }
}
