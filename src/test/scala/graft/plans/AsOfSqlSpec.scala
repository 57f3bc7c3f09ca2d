package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The ASOF LEFT JOIN SQL surface (GraftSqlParser + ResolveAsOfJoin via
  * SparkSessionExtensions): the SQL spelling must produce the custom
  * exec and the DSL twin's exact rows, in both directions, and the
  * guarded shapes must fail loudly at parse/analysis time. */
class AsOfSqlSpec extends AnyFunSuite {

  private lazy val s: SparkSession = {
    graft.TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ext = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    SparkSession.setDefaultSession(graft.TestSpark.spark)
    SparkSession.setActiveSession(graft.TestSpark.spark)
    ext
  }

  private val sf = "/root/testdata/sf0.001"

  private def views(): Unit = {
    graft.queries.EventQueries.asofPurchases(s, sf)
      .createOrReplaceTempView("asql_p")
    graft.queries.EventQueries.asofClicks(s, sf)
      .createOrReplaceTempView("asql_c")
  }

  test("ASOF LEFT JOIN SQL plans the custom exec and equals the DSL twin") {
    views()
    val sql = s.sql(
      """SELECT p.event_id, p.user_id, p.t_us, p.value,
        |       c.click_id, c.c_us AS click_us, c.click_value
        |FROM asql_p p ASOF LEFT JOIN asql_c c
        |  ON p.user_id = c.c_user AND p.t_us >= c.c_us
        |ORDER BY p.event_id""".stripMargin)
    val rows = sql.collect().toSeq
    assert(sql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val dsl = graft.queries.EventQueries.asofEnrich(s, sf).collect().toSeq
    assert(rows == dsl && rows.nonEmpty)
  }

  test("flipped operand order and <= resolve to the forward direction") {
    views()
    // c.c_us >= p.t_us == p.t_us <= c.c_us: both forward
    val a = s.sql(
      """SELECT p.event_id, c.click_id FROM asql_p p ASOF LEFT JOIN asql_c c
        |  ON p.user_id = c.c_user AND c.c_us >= p.t_us
        |ORDER BY p.event_id""".stripMargin).collect().toSeq
    val b = s.sql(
      """SELECT p.event_id, c.click_id FROM asql_p p ASOF LEFT JOIN asql_c c
        |  ON p.user_id = c.c_user AND p.t_us <= c.c_us
        |ORDER BY p.event_id""".stripMargin).collect().toSeq
    val dsl = AsOf.join(
        graft.queries.EventQueries.asofPurchases(s, sf),
        graft.queries.EventQueries.asofClicks(s, sf),
        Seq("user_id" -> "c_user"), "t_us", "c_us", forward = true)
      .selectExpr("event_id", "click_id").orderBy("event_id").collect().toSeq
    assert(a == dsl && b == dsl && a.nonEmpty)
  }

  test("bare ASOF JOIN and multiple ASOF joins are parse errors") {
    views()
    val bare = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      s.sql("SELECT 1 FROM asql_p p ASOF JOIN asql_c c ON p.user_id = c.c_user AND p.t_us >= c.c_us")
    }
    assert(bare.getMessage.contains("ASOF LEFT JOIN"))
    val two = intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      s.sql(
        """SELECT 1 FROM asql_p p
          |ASOF LEFT JOIN asql_c c ON p.user_id = c.c_user AND p.t_us >= c.c_us
          |ASOF LEFT JOIN asql_c d ON p.user_id = d.c_user AND p.t_us >= d.c_us""".stripMargin)
    }
    assert(two.getMessage.contains("at most one"))
  }

  test("a condition without a time inequality fails analysis") {
    views()
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      s.sql(
        """SELECT 1 FROM asql_p p ASOF LEFT JOIN asql_c c
          |  ON p.user_id = c.c_user""".stripMargin).collect()
    }
    assert(e.getMessage.contains("time inequality"))
  }
}
