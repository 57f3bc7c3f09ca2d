package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Session tuning applied at the top of every query. The driver owns the
  * SparkSession (Bench.scala/Verify.scala create it), so we only touch
  * runtime-settable SQL confs here, never builder-time ones.
  *
  * Rationale (100 TB posture, tested at local[32]):
  *  - AQE on: runtime shuffle-partition coalescing, skew-join splitting and
  *    dynamic broadcast conversion are the main levers that keep the same
  *    declarative plan viable from sf0.01 up to a 1000-executor cluster.
  *  - autoBroadcastJoinThreshold raised: dimension tables (region, nation,
  *    supplier, even customer at moderate SF) must never sort-merge against
  *    the fact table; 64 MB is still trivially small per executor.
  *  - nested schema pruning on (default in 4.x, pinned for safety): scans
  *    must read only the projected sub-fields.
  */
object Engine {
  def tune(spark: SparkSession): Unit = {
    def set(k: String, v: String): Unit =
      try spark.conf.set(k, v) catch {
        case NonFatal(e) =>
          System.err.println(s"[engine] cannot set $k: ${e.getMessage}")
      }
    set("spark.sql.adaptive.enabled", "true")
    set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    set("spark.sql.adaptive.skewJoin.enabled", "true")
    set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    set("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
    set("spark.sql.session.timeZone", "UTC")
  }
}
