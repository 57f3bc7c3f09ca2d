package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mechanism proofs for the round-10 analytics/retrieval operators —
  * the properties the DuckDB oracle (which runs the same algebra)
  * cannot itself witness.
  */
class Round10OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("attribution: first-event purchases credit 'none', later purchases skip purchase channels") {
    import spark.implicits._
    val d = graft.TempDirs.create("graft-attr").toString
    // user 1: purchase first (no prior -> none), then click, purchase,
    // purchase (both credit click — a purchase never credits a purchase)
    Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 10.0, "{}"),
      (2L, "2024-01-01 00:01:00", 1L, "click", 0.0, "{}"),
      (3L, "2024-01-01 00:02:00", 1L, "purchase", 20.0, "{}"),
      (4L, "2024-01-01 00:03:00", 1L, "purchase", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = EventQueries.attribution(spark, d).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getDouble(2))).toMap
    assert(r == Map("click" -> ((2L, 50.0)), "none" -> ((1L, 10.0))))
  }

  test("rrf: emitted score equals 1/(k+r_lex) + 1/(k+r_dense) recomputed from its own ranks") {
    val k = graft.similarity.Similarity.RrfK
    graft.similarity.Similarity.rrfFusion(spark, sf).collect().foreach { r =>
      val (lex, dense, rrf) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      val expect = BigDecimal(
        (if (lex > 0) 1.0 / (k + lex) else 0.0) +
          (if (dense > 0) 1.0 / (k + dense) else 0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(rrf - expect) < 1e-9, s"row $r expected $expect")
    }
  }

  test("bm25: the emitted score of every row reproduces from collect-side arithmetic") {
    import graft.text.TextAnalysis.{Bm25K1, Bm25B, Bm25Terms, Bm25IdfScale}
    val docs = graft.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    val dl = docs.view.mapValues(_.length.toLong).toMap
    val nDocs = dl.size.toLong
    val avgScale = dl.values.sum // tok_total
    val df = Bm25Terms.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    def score(id: Long): Double = {
      val s = Bm25Terms.map { t =>
        val tf = docs(id).count(_ == t).toLong
        if (tf == 0) 0.0
        else {
          val idf = math.floor(math.log(
            (nDocs - df(t) + 0.5) / (df(t) + 0.5) + 1.0) * Bm25IdfScale) / Bm25IdfScale
          idf * ((tf * (Bm25K1 + 1.0)) /
            (tf + Bm25K1 * (1.0 - Bm25B + Bm25B * dl(id) * nDocs / avgScale.toDouble)))
        }
      }.sum
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val out = graft.text.TextAnalysis.bm25(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(math.abs(r.getDouble(1) - score(r.getLong(0))) < 1e-6, s"row $r")
    }
  }

  test("dau/wau: wau bounds — at least the day's dau, at most the trailing week's dau sum") {
    val rows = EventQueries.dauWau(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val dauByDay = rows.map(r => r._1 -> r._2).toMap
    rows.foreach { case (day, dau, wau) =>
      assert(wau >= dau, s"$day: wau $wau < dau $dau")
      val weekSum = (0 until 7).map(k => dauByDay.getOrElse(day.minusDays(k), 0L)).sum
      assert(wau <= weekSum, s"$day: wau $wau > 7-day dau sum $weekSum")
    }
  }

  test("exact median: the rank property holds against the raw rows") {
    val meds = RelationalQueries.exactMedianGrouped(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(meds.nonEmpty)
    val raw = graft.Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    meds.foreach { case (prio, med, n) =>
      val vals = raw.filter(_._1 == prio).map(_._2)
      assert(vals.length.toLong == n)
      val below = vals.count(_ < med)
      val atOrBelow = vals.count(_ <= med)
      val kth = (vals.length + 1) / 2
      assert(below < kth && atOrBelow >= kth,
        s"$prio: median $med violates rank property (below=$below, atOrBelow=$atOrBelow, k=$kth)")
    }
  }
}
