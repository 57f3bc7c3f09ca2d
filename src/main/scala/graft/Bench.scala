package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main: runs every registered query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Results are materialized through the `noop` batch
  * writer — every row is fully computed and serialized by the real plan
  * (sorts included; `.count()` would let `EliminateSorts` drop the declared
  * output order and skip result materialization entirely).
  *
  * Each query is timed over SPARK_GRAFT_BENCH_RUNS executions (default 2)
  * and the MINIMUM is reported, labeled via the `runs` field. Rationale:
  * a query's first execution pays 1–6 s of Catalyst/janino/JIT compile
  * (measured ±30% run-to-run noise on this box), a one-time cost that
  * amortizes to zero in any real deployment; the warm time is the number
  * that scales with the data.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: shutdown-time WARN spam (e.g. DAGScheduler "Failed
    // to cancel job group") lands in the driver's 4 KB stdout tail right
    // around the JSON line and crowds it out
    spark.sparkContext.setLogLevel("ERROR")
    // Session warmup outside the timed region: first-scan/first-shuffle/
    // codegen JIT costs land here instead of on whichever query sorts first.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case NonFatal(e) => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // A throwing query must never masquerade as a fast success: each run
    // carries an ok flag, failed queries are listed by name in the detail
    // file, and the stdout line reports n_failed (0 on a healthy run).
    val measured = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val attempts = (0 until runs).map { _ =>
          val t0 = System.nanoTime()
          val runOk =
            try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
            catch { case NonFatal(e) =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
            }
          ((System.nanoTime() - t0) / 1e9, runOk)
        }
        // the reported time is the min over SUCCESSFUL runs only — a run
        // that threw in 50 ms must not undercut a 5 s successful run and
        // shrink the headline total; only when every run failed does the
        // (worst) failure time stand in, so breakage still costs, never
        // pays. ANY failed run marks the query not-ok (flaky is not ok).
        val anySuccess = attempts.exists(_._2)
        val t = if (anySuccess) attempts.collect { case (s, true) => s }.min
                else attempts.map(_._1).max
        (name, t, attempts.forall(_._2))
      }
    val results = measured.map { case (n, t, _) => (n, t) }
    val failed = measured.collect { case (n, _, false) => n }
    // The driver retains only a ~4 KB stdout tail and parses the JSON line
    // from it. A full per-query map no longer fits (106 queries × ~28 chars
    // ≈ 4.9 KB — BENCH_r03/r04 recorded parsed:null for exactly this), so
    // the stdout line carries the total, per-family subtotals, and the
    // slowest individual queries, with the complete per-query map written
    // to BENCH_DETAIL.json in the working directory. A hard length guard
    // sheds entries rather than ever overflowing the tail again.
    def fmt(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", v)
    def jmap(m: Seq[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val families = results.groupBy(_._1.takeWhile(_ != '_'))
      .map { case (f, qs) => f -> qs.map(_._2).sum }.toSeq.sortBy(-_._2)
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_DETAIL.json"),
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(results)},""" +
        s""""n_failed":${failed.size},"failed":$failedJson,"sf":"$sfDir","runs":$runs}""")
    def line(k: Int): String = {
      val slowest = results.sortBy(-_._2).take(k)
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${jmap(slowest)},""" +
        s""""families":${jmap(families)},"n_queries":${results.size},"n_failed":${failed.size},""" +
        s""""detail":"BENCH_DETAIL.json","sf":"$sfDir","runs":$runs}"""
    }
    // k=0 drops the per-query/family maps entirely; if even that overflows
    // the driver's 4 KB stdout tail, fall back to a bare total-only line
    // rather than dying on .get after all the timing work is done.
    println(Iterator.range(15, -1, -1).map(line).find(_.length <= 3000).getOrElse(
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.size},""" +
        s""""n_failed":${failed.size},"sf":"$sfDir","runs":$runs}"""))
    System.out.flush()
    spark.stop()
  }
}
