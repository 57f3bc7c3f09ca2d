package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The custom AS-OF JOIN tier (logical node → strategy → merge exec)
  * must agree row-for-row with the built-in per-left-max composition it
  * replaces, plan the custom exec (no silent fallback), preserve left
  * rows exactly (left-outer contract), and report its SQLMetrics. The
  * registered query (`ev_asof_enrich`) is additionally gated against
  * DuckDB's NATIVE `ASOF LEFT JOIN` by the driver. */
class AsOfJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def enriched = graft.queries.EventQueries.asofEnrich(spark, sf)

  private def purchases = {
    val ev = graft.Tables(spark, sf, "events")
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("t_us"), col("value"))
  }

  private def clicks = {
    val ev = graft.Tables(spark, sf, "events")
    ev.filter(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
      .agg(max(col("event_id")).as("click_id"), max(col("value")).as("click_value"))
  }

  test("agrees with the built-in range-join + per-left max composition") {
    val p = purchases
    val c = clicks
    // matched lefts: greatest (c_us, click_id, click_value) struct per
    // purchase — (c_user, c_us) is unique by construction, so the max
    // is a deterministic single row
    val best = p.join(c,
        p("user_id") === c("c_user") && c("c_us") <= p("t_us"))
      .groupBy("event_id")
      .agg(max(struct(col("c_us"), col("click_id"), col("click_value"))).as("m"))
    val expected = p.join(best, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("t_us"), col("value"),
        col("m.click_id").as("click_id"), col("m.c_us").as("click_us"),
        col("m.click_value").as("click_value"))
      .orderBy("event_id")

    val a = enriched.collect().toSeq
    val b = expected.collect().toSeq
    assert(a == b && a.nonEmpty)
    assert(a.exists(r => !r.isNullAt(4)), "no purchase matched any click")
  }

  test("plans the custom exec, not a fallback join") {
    val df = enriched
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan)
  }

  test("left-outer contract: every left row exactly once") {
    assert(enriched.count() == purchases.count())
    assert(enriched.select("event_id").distinct().count() == purchases.count())
  }

  test("SQLMetrics: output rows and matched rows") {
    // no orderBy on top: a range exchange SAMPLES its child RDD (one
    // extra execution pass), which would double every child metric —
    // the same approximation vanilla Spark accepts under global sorts
    val df = AsOf.join(purchases, clicks, Seq("user_id" -> "c_user"), "t_us", "c_us")
    val rows = df.collect()
    val exec = allNodes(df.queryExecution.executedPlan)
      .collectFirst { case e: AsOfJoinExec => e }.get
    val matchedIdx = df.columns.indexOf("click_id")
    assert(exec.metrics("numOutputRows").value == rows.length)
    assert(exec.metrics("numMatched").value == rows.count(!_.isNullAt(matchedIdx)))
    assert(exec.metrics("numMatched").value > 0)
  }

  test("tie on time matches (>= semantics); null left time matches nothing") {
    import spark.implicits._
    val l = Seq(
      (1L, 10L, java.lang.Long.valueOf(100L)), // exact tie with right ts
      (1L, 11L, java.lang.Long.valueOf(50L)),  // before any right row
      (1L, 12L, null.asInstanceOf[java.lang.Long]), // null time
      (2L, 20L, java.lang.Long.valueOf(999L))  // key with no right rows
    ).toDF("k", "lid", "lt")
    val r = Seq(
      (1L, 100L, 7L),
      (1L, 200L, 8L)
    ).toDF("rk", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k" -> "rk"), "lt", "rt")
      .select(col("lid"), col("rid")).orderBy("lid")
      .collect().map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(out.toSeq == Seq((10L, 7L), (11L, -1L), (12L, -1L), (20L, -1L)))
  }

  test("later left rows of a key still see right rows a null-timed left skipped") {
    import spark.implicits._
    val l = Seq(
      (1L, 1L, null.asInstanceOf[java.lang.Long]),
      (1L, 2L, java.lang.Long.valueOf(300L))
    ).toDF("k", "lid", "lt")
    val r = Seq((1L, 100L, 7L)).toDF("rk", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k" -> "rk"), "lt", "rt")
      .select(col("lid"), col("rid")).orderBy("lid")
      .collect().map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(out.toSeq == Seq((1L, -1L), (2L, 7L)))
  }

  test("forward direction: nearest at-or-after; candidate peeked, not consumed") {
    import spark.implicits._
    val l = Seq(
      (1L, 10L, 90L),  // rt=100 is the next
      (1L, 11L, 95L),  // SAME candidate rt=100 (peek semantics)
      (1L, 12L, 100L), // exact tie still matches (>=)
      (1L, 13L, 201L)  // past the last right row -> null
    ).toDF("k", "lid", "lt")
    val r = Seq((1L, 100L, 7L), (1L, 200L, 8L)).toDF("rk", "rt", "rid")
    val out = AsOf.join(l, r, Seq("k" -> "rk"), "lt", "rt", forward = true)
      .select(col("lid"), col("rid")).orderBy("lid")
      .collect().map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
    assert(out.toSeq == Seq((10L, 7L), (11L, 7L), (12L, 7L), (13L, -1L)))
  }

  test("tolerance bounds the match distance in both directions") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L), (1L, 11L, 150L)).toDF("k", "lid", "lt")
    val r = Seq((1L, 95L, 7L), (1L, 160L, 8L)).toDF("rk", "rt", "rid")
    def run(fwd: Boolean, tol: Long) =
      AsOf.join(l, r, Seq("k" -> "rk"), "lt", "rt", fwd, Some(tol))
        .select(col("lid"), col("rid")).orderBy("lid")
        .collect().map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1))).toSeq
    // backward: lid=10 matches rt=95 (gap 5); lid=11's best is still
    // rt=95 but it has AGED OUT at tol=20 (gap 55)
    assert(run(fwd = false, tol = 20) == Seq((10L, 7L), (11L, -1L)))
    assert(run(fwd = false, tol = 60) == Seq((10L, 7L), (11L, 7L)))
    // forward: lid=10's next is rt=160 (gap 60) - in at 60, out at 20
    assert(run(fwd = true, tol = 20) == Seq((10L, -1L), (11L, 8L)))
    assert(run(fwd = true, tol = 60) == Seq((10L, 8L), (11L, 8L)))
  }

  test("ev_asof_forward agrees with the range-join + per-left min composition") {
    val fwd = graft.queries.EventQueries.asofForward(spark, sf)
    val p = purchases
    val c = clicks
    val tol = graft.queries.EventQueries.AsOfForwardTolUs
    val best = p.join(c,
        p("user_id") === c("c_user") && c("c_us") >= p("t_us") &&
          c("c_us") - p("t_us") <= tol)
      .groupBy("event_id")
      .agg(min(struct(col("c_us"), col("click_id"), col("click_value"))).as("m"))
    val expected = p.join(best, Seq("event_id"), "left")
      .select(col("event_id"), col("user_id"), col("t_us"), col("value"),
        col("m.click_id").as("click_id"), col("m.c_us").as("click_us"),
        col("m.click_value").as("click_value"))
      .orderBy("event_id")
    val a = fwd.collect().toSeq
    val b = expected.collect().toSeq
    assert(a == b && a.nonEmpty)
    // the tolerance actually bites AND matches exist
    assert(a.exists(_.isNullAt(4)) && a.exists(r => !r.isNullAt(4)))
  }

  test("shared column names across the two sides fail loudly") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1L, 1L)).toDF("k", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, Seq("k" -> "k"), "t", "rt")
    }
    assert(e.getMessage.contains("share column names"))
  }

  // ---- rightSuffix shared-name convention (r17, VERDICT r16 #6) ----

  test("rightSuffix joins shared-name frames with deterministic output names") {
    import spark.implicits._
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("k", "t", "v")
    val r = Seq((1L, 5L, "x"), (1L, 15L, "y")).toDF("k", "t", "v")
    // every right name collides; keys/time still name the ORIGINALS
    val j = AsOf.join(l, r, Seq("k" -> "k"), "t", "t",
      rightSuffix = Some("_r"))
    assert(j.columns.toSeq == Seq("k", "t", "v", "k_r", "t_r", "v_r"))
    val rows = j.orderBy("t").select("t", "t_r", "v_r").collect().toSeq
    assert(rows.map(x => (x.getLong(0), x.getLong(1), x.getString(2))) ==
      Seq((10L, 5L, "x"), (20L, 15L, "y")))
    // and equals the manual-rename twin row-for-row
    val manual = AsOf.join(l,
      r.withColumnsRenamed(Map("k" -> "k_r", "t" -> "t_r", "v" -> "v_r")),
      Seq("k" -> "k_r"), "t", "t_r")
    assert(j.collect().toSeq == manual.collect().toSeq)
  }

  test("rightSuffix works on the interval join; pathological suffix fails loudly") {
    import spark.implicits._
    val l = Seq((1L, 0L, 10L)).toDF("k", "s", "e")
    val r = Seq((1L, 5L, 15L), (1L, 11L, 20L)).toDF("k", "s", "e")
    val j = Interval.join(l, r, Seq("k" -> "k"), ("s", "e"), ("s", "e"),
      rightSuffix = Some("_r"))
    assert(j.columns.toSeq == Seq("k", "s", "e", "k_r", "s_r", "e_r"))
    assert(j.count() == 1) // only [5,15] overlaps [0,10]
    // a suffix that lands on an EXISTING left name is still ambiguous —
    // the distinct-names guard stays authoritative
    val l2 = Seq((1L, 10L, 0L)).toDF("k", "t", "k_r")
    val r2 = Seq((1L, 5L)).toDF("k", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l2, r2, Seq("k" -> "k"), "t", "rt", rightSuffix = Some("_r"))
    }
    assert(e.getMessage.contains("share column names"))
  }
}
