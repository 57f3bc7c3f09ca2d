package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The driver fixture is referentially clean, so rel_dq_audit's oracle
  * gate only proves the all-green report there; this pins that every
  * check actually FIRES on a deliberately dirty warehouse. */
class DqAuditSpec extends SparkSpec {

  test("every declared check counts its violations on a dirty warehouse") {
    import spark.implicits._
    val dir = graft.TempDirs.create("graft-dq-spec").toString
    Seq((1L, 1L, 10.0, "2024-01-01"),   // clean
      (2L, 99L, 10.0, "2024-01-01"),    // orphan custkey
      (3L, 1L, 10.0, "2024-01-01"),     // dup key (x3: 2 violations)
      (3L, 1L, 11.0, "2024-01-02"),
      (3L, 1L, 12.0, "2024-01-03"),
      (4L, 1L, -5.0, "2024-01-01"),     // nonpositive total
      (5L, 1L, 0.0, null))              // null date AND nonpositive
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "s")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("s").cast("date").as("o_orderdate"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq(Tuple1(1L)).toDF("c_custkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq(Tuple1(1L), Tuple1(777L)).toDF("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = RelationalQueries.dqAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(
      ("lineitem_orphan_orderkey", 1L),
      ("orders_dup_orderkey", 2L),
      ("orders_nonpositive_total", 2L),
      ("orders_null_orderdate", 1L),
      ("orders_orphan_custkey", 1L)))
  }
}
