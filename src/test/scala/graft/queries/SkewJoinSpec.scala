package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** AQE's runtime skew remedy — the adaptive counterpart of the MANUAL
  * salting in rel_salted_join/rel_salted_join_hot: a sort-merge join
  * whose one hot key dwarfs every other partition must be split at
  * runtime (OptimizeSkewedJoin marks the join `skew=true` in the final
  * adaptive plan), with the result identical to the unsplit join. */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 97% of the fact rows share key 0; the dim side is uniform
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 32 =!= 0, 0L).otherwise(col("id")).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 200000).select(col("id").as("k2"))
      val q = fact.join(dim, col("k") === col("k2"))
        .agg(count(lit(1)).as("cnt"), sum(col("payload")).as("s"))
      // collect() (not head(): head plans a separate limited execution)
      // so the adaptive final plan lands on THIS QueryExecution
      val row = q.collect().head
      val finalPlan = q.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the join:\n$finalPlan")
      // the split is physical only: result matches the naive computation
      // (every key-0 row joins dim's single key-0 row, others 1:1)
      assert(row.getLong(0) == 200000L)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
