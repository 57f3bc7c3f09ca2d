package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak for the CUSTOM JOIN tiers (round 16): the as-of merge
  * ([[graft.plans.AsOf]]) and the interval plane sweep
  * ([[graft.plans.Interval]]) measured TWO DECADES past the sf0.1 event
  * count — 100k / 1M / 10M rows per side — on closed-form synthetic
  * frames generated distributedly from `spark.range` (no files, no RNG).
  *
  * Construction (U = n/100 users, k = row div U):
  *  - as-of: purchases at t = 100k + 10, clicks at t = 100k per user —
  *    every left matches its own k's click, gap exactly 10, so the gate
  *    is `count = n AND sum(gap) = 10n` (any dropped row, wrong-side
  *    match, or tie mishandling breaks an exact integer).
  *  - interval: left windows [100k, 100k+50], right [100k+40, 100k+90]
  *    — exactly one overlap per left of width exactly 10; same gate.
  *
  * Both operators are O(rows) per partition past their one shuffle, so
  * the 100× time ratio is the number that would expose any accidental
  * per-key quadratic term (the failure mode these execs exist to
  * avoid). */
object SoakJoins {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val scales = Seq(100000L, 1000000L, 10000000L)

    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      math.min(run(), run())
    }

    val results = scales.map { n =>
      val u = n / 100
      def leftAsof = spark.range(n).select(
        (col("id") % u).as("lu"), col("id").as("lid"),
        (expr(s"id div $u") * 100 + 10).as("lt"))
      def rightAsof = spark.range(n).select(
        (col("id") % u).as("ru"), col("id").as("rid"),
        (expr(s"id div $u") * 100).as("rt"))
      def asof = graft.plans.AsOf.join(leftAsof, rightAsof,
        Seq("lu" -> "ru"), "lt", "rt")
      val aGate = asof.agg(count(lit(1)).as("c"),
        count(col("rid")).as("m"), sum(col("lt") - col("rt")).as("g")).head()
      require(aGate.getLong(0) == n && aGate.getLong(1) == n &&
          aGate.getLong(2) == 10L * n,
        s"asof gate violated at n=$n: $aGate (want $n, $n, ${10L * n})")
      val tAsof = timed(asof)

      def leftIvl = spark.range(n).select(
        (col("id") % u).as("lu"), col("id").as("lid"),
        (expr(s"id div $u") * 100).as("ls"),
        (expr(s"id div $u") * 100 + 50).as("le"))
      def rightIvl = spark.range(n).select(
        (col("id") % u).as("ru"), col("id").as("rid"),
        (expr(s"id div $u") * 100 + 40).as("rs"),
        (expr(s"id div $u") * 100 + 90).as("re"))
      def ivl = graft.plans.Interval.join(leftIvl, rightIvl,
        Seq("lu" -> "ru"), ("ls", "le"), ("rs", "re"))
      val iGate = ivl.agg(count(lit(1)).as("c"),
        sum(least(col("le"), col("re")) - greatest(col("ls"), col("rs"))).as("g")).head()
      require(iGate.getLong(0) == n && iGate.getLong(1) == 10L * n,
        s"interval gate violated at n=$n: $iGate (want $n, ${10L * n})")
      val tIvl = timed(ivl)
      (n, tAsof, tIvl)
    }
    val fields = results.map { case (n, ta, ti) =>
      s""""asof$n":${String.format(java.util.Locale.ROOT, "%.3f", ta)},""" +
        s""""ivl$n":${String.format(java.util.Locale.ROOT, "%.3f", ti)}"""
    }.mkString(",")
    val aX = results.last._2 / results.head._2
    val iX = results.last._3 / results.head._3
    println(s"""{"probe":"join_decades",$fields,""" +
      s""""asof_x100":${String.format(java.util.Locale.ROOT, "%.2f", aX)},""" +
      s""""ivl_x100":${String.format(java.util.Locale.ROOT, "%.2f", iX)}}""")
    spark.stop()
  }
}
