package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `OPTIMIZE <catalog>.<table>` SQL verb through the injected
  * parser: compaction runs behind the pointer-swap commit, the result
  * row reports the file-count drop, and the guard rails (missing table,
  * non-graft catalog, bad arity, no name) fail loudly as parse/analysis
  * errors — never as an internal error or a silent no-op. */
class MaintenanceSqlSpec extends AnyFunSuite {

  private lazy val s: SparkSession =
    graft.queries.EventQueries.extensionSession(graft.TestSpark.spark)

  private def freshCatalog(): String = {
    val cat = s"moptspec${System.nanoTime() % 100000}"
    val root = graft.TempDirs.create("mopt-spec")
    s.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    s.conf.set(s"spark.sql.catalog.$cat.root", root.toString)
    cat
  }

  test("OPTIMIZE compacts, reports, and is idempotent") {
    val cat = freshCatalog()
    s.sql(s"CREATE TABLE $cat.t (id BIGINT, v DOUBLE)")
    s.sql(s"INSERT INTO $cat.t SELECT id, 0.5 FROM range(0, 100)")
    s.sql(s"INSERT INTO $cat.t SELECT id, 0.5 FROM range(100, 150)")
    val r = s.sql(s"OPTIMIZE $cat.t").head()
    assert(r.getInt(1) >= 2 && r.getInt(2) == 1 && r.getLong(3) == 150L, r.toString)
    // content identical through the compacted manifest
    assert(s.sql(s"SELECT count(*) AS n, CAST(sum(id) AS BIGINT) AS s FROM $cat.t")
      .head() == org.apache.spark.sql.Row(150L, 150L * 149L / 2))
    // idempotent: a second OPTIMIZE is a no-op at the same version
    val r2 = s.sql(s"OPTIMIZE $cat.t").head()
    assert(r2.getLong(0) == r.getLong(0) && r2.getInt(1) == 1 && r2.getInt(2) == 1)
    // trailing semicolon and backtick quoting parse
    assert(s.sql(s"OPTIMIZE `$cat`.`t`;").head().getInt(2) == 1)
  }

  test("OPTIMIZE guard rails fail loudly") {
    val cat = freshCatalog()
    intercept[Exception] { s.sql(s"OPTIMIZE $cat.nope") } // missing table
    intercept[Exception] { s.sql("OPTIMIZE ") }           // no name
    intercept[Exception] { s.sql("OPTIMIZE just_one_part") } // 1-part name
    intercept[Exception] { s.sql("OPTIMIZE not_a_catalog.t") } // unregistered
    // a registered NON-graft catalog is refused by implementation check
    s.conf.set("spark.sql.catalog.moptjdbc",
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
    intercept[Exception] { s.sql("OPTIMIZE moptjdbc.t") }
    // OPTIMIZE inside a literal is data, not syntax
    val one = s.sql("SELECT 'OPTIMIZE x.y' AS s").head().getString(0)
    assert(one == "OPTIMIZE x.y")
  }
}
