package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extension path a session-owning user exercises: SQL-callable
  * native functions and the dot→norm optimizer rewrite, registered via
  * SparkSessionExtensions on a session the library does NOT build. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions register SQL functions and the DotToNorm optimizer rule") {
    val base = graft.TestSpark.spark // materialize the shared context first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s.implicits._
      Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
        .createOrReplaceTempView("graft_ext_v")
      val r = s.sql("SELECT graft_dot(a, b) AS d, graft_norm2(a) AS n FROM graft_ext_v").head()
      assert(r.getDouble(0) == 11.0)
      assert(r.getDouble(1) == 5.0)
      // plan assertions need a non-local source (a literal input folds to
      // a LocalRelation before the plan can be inspected — which already
      // proves the functions evaluate); use the parquet fixture
      s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .createOrReplaceTempView("graft_ext_emb")
      // self-dot canonicalizes to the cheaper norm operator
      val q = s.sql("SELECT graft_dot(embedding, embedding) AS selfdot FROM graft_ext_emb")
      assert(q.queryExecution.optimizedPlan.toString.contains("graft_norm2"))
      val viaNorm = s.sql("SELECT graft_norm2(embedding) AS n FROM graft_ext_emb")
        .collect().map(_.getDouble(0)).toSeq
      assert(q.collect().map(_.getDouble(0)).toSeq == viaNorm && viaNorm.nonEmpty)
      // the rule must NOT fire on distinct inputs
      val q2 = s.sql(
        "SELECT graft_dot(a.embedding, b.embedding) AS d FROM graft_ext_emb a, graft_ext_emb b")
      assert(q2.queryExecution.optimizedPlan.toString.contains("graft_dot"))
      // wrong arity surfaces as the analyzer's standard error, not an
      // IndexOutOfBoundsException out of the builder
      val wrongArity = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_dot(a) FROM graft_ext_v").collect()
      }
      assert(wrongArity.getMessage.contains("graft_dot"))
      assert(wrongArity.getMessage.contains("2"))
      // the custom aggregate registers and aggregates through SQL
      val topk = s.sql(
        "SELECT graft_topk(CAST(n AS DOUBLE), 2) AS t FROM VALUES (1), (5), (3) v(n)")
        .head().getSeq[Double](0)
      assert(topk == Seq(5.0, 3.0))
      val badK = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_topk(CAST(n AS DOUBLE), n) FROM VALUES (1) v(n)").collect()
      }
      assert(badK.getMessage.contains("graft_topk"))
      // the char-entropy kernel registers: uniform two-symbol string → ln 2
      val ent = s.sql("SELECT graft_char_entropy('abab') AS e").head().getDouble(0)
      assert(math.abs(ent - math.log(2)) < 1e-12)
      val badEnt = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_char_entropy('a', 'b')").collect()
      }
      assert(badEnt.getMessage.contains("graft_char_entropy"))
      // the z-order layout key registers and interleaves
      val z = s.sql("SELECT graft_zvalue(5L, 3L) AS z").head().getLong(0)
      assert(z == 27L)
      val badZ = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_zvalue(1L) AS z").collect()
      }
      assert(badZ.getMessage.contains("graft_zvalue"))
      // narrower integrals are accepted un-cast (the kernel widens) and
      // agree with the BIGINT spelling
      val zc = s.sql(
        "SELECT graft_zvalue(CAST(5 AS INT), CAST(3 AS SMALLINT)) AS z")
        .head().getLong(0)
      assert(zc == 27L)
      // a non-coercible input still fails analysis with the standard error
      intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_zvalue(array(1L), 1L)").collect()
      }
      // lossy coercions are rejected loudly, not silently truncated:
      // a DOUBLE or STRING coordinate would floor into a wrong layout key
      val badDouble = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_zvalue(CAST(5.9 AS DOUBLE), 3L)").collect()
      }
      assert(badDouble.getMessage.contains("integral"))
      intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_zvalue('5', 3L)").collect()
      }
      // ...through the Column API too, not just SQL
      import org.apache.spark.sql.functions.col
      val dblDf = s.range(4).selectExpr("CAST(id AS DOUBLE) AS d", "id AS y")
      val badCol = intercept[org.apache.spark.sql.AnalysisException] {
        dblDf.select(graft.functions.ZOrder.zvalue("d", "y")).collect()
      }
      assert(badCol.getMessage.contains("integral"))
      // an EXPLICIT CAST(double AS BIGINT) is the documented opt-in —
      // accepted, evaluates, and stays accepted when chained (the check
      // reads dataTypes only, so single vs nested casts are consistent)
      assert(s.sql("SELECT graft_zvalue(CAST(5.9 AS BIGINT), 3L) AS z")
        .head().getLong(0) == 27L)
      assert(s.sql(
        "SELECT graft_zvalue(CAST(CAST('5' AS BIGINT) AS BIGINT), 3L) AS z")
        .head().getLong(0) == 27L)
      assert(dblDf.select(graft.functions.ZOrder.zvalue2(
        col("d").cast("long"), col("y")).as("z"))
        .filter(col("z") >= 0).count() == 4L)
      // the round-6 crash shape through SQL: cast-derived bigint in a
      // subquery, zvalue over it, filter on top — CollapseProject +
      // PushDownPredicates must not flip the expression to unresolved
      s.range(0, 1024).createOrReplaceTempView("zorder_cast_v")
      assert(s.sql(
        """SELECT z FROM (
          |  SELECT graft_zvalue(x, y) AS z FROM (
          |    SELECT id % 32 AS x, CAST(id / 32 AS BIGINT) AS y
          |    FROM zorder_cast_v))
          |WHERE z > 100""".stripMargin).count() > 0)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("signature kernels are SQL-callable and agree with the Column spellings") {
    val base = graft.TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import org.apache.spark.sql.functions.col
      s.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .createOrReplaceTempView("graft_ext_docs")
      def viaCol(e: org.apache.spark.sql.catalyst.expressions.Expression) =
        org.apache.spark.sql.GraftBridge.column(e)
      val textExpr = org.apache.spark.sql.GraftBridge.expression(col("text"))
      val docs = s.table("graft_ext_docs")
      // each SQL spelling row-identical to the Column-API spelling
      val sqlRows = s.sql(
        """SELECT doc_id, graft_simhash48(text) AS sh, graft_ahash(text, 48) AS ah,
          |       graft_phash(text) AS ph,
          |       graft_minhash(text, 12) AS mh, graft_minhash(text, 12, 3) AS mb
          |FROM graft_ext_docs ORDER BY doc_id""".stripMargin).collect().toSeq
      val colRows = docs.select(col("doc_id"),
          viaCol(graft.functions.SimHash48(textExpr)).as("sh"),
          viaCol(graft.functions.AHash(textExpr, 48)).as("ah"),
          viaCol(graft.functions.PHash64(textExpr)).as("ph"),
          viaCol(graft.functions.MinHashSignature(textExpr, 12)).as("mh"),
          viaCol(graft.functions.MinHashSignature(textExpr, 12, 3)).as("mb"))
        .orderBy("doc_id").collect().toSeq
      assert(sqlRows == colRows && sqlRows.nonEmpty)
      // parameter discipline: non-literal / non-int sizes are analyzer errors
      val badBits = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_ahash(text, doc_id) FROM graft_ext_docs").collect()
      }
      assert(badBits.getMessage.contains("graft_ahash"))
      val badRange = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_ahash(text, 63) FROM graft_ext_docs").collect()
      }
      assert(badRange.getMessage.toLowerCase.contains("bits"))
      // bits=1 would divide by (bits - 1) = 0 in the sampling formula —
      // must die at analysis, not as a runtime ArithmeticException
      val badOne = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_ahash(text, 1) FROM graft_ext_docs").collect()
      }
      assert(badOne.getMessage.toLowerCase.contains("bits"))
      // graft_minhash's THIRD argument failing must name bandWidth, not
      // claim a "second argument" problem
      val badThird = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_minhash(text, 12, doc_id) FROM graft_ext_docs").collect()
      }
      assert(badThird.getMessage.contains("bandWidth"))
      val badArity = intercept[org.apache.spark.sql.AnalysisException] {
        s.sql("SELECT graft_minhash(text) FROM graft_ext_docs").collect()
      }
      assert(badArity.getMessage.contains("graft_minhash"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
