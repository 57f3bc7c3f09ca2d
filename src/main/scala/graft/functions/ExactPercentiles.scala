package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact percentile read-off over a (group, value, cnt) histogram frame —
  * THE single source of the integer-rank spelling ceil(n·p/100) =
  * (n·p + 99) div 100, shared by the batch report
  * (`rel_percentiles_grouped`) and the streaming monitor
  * (`stream_latency_pctl`) on both the Spark and the oracle side, so the
  * online and offline percentile reports cannot fork — structurally, not
  * by textual discipline. No interpolation, no float rank: both engines
  * pick the identical witness value. The windows run over the histogram
  * frame only (|groups|·|distinct values| rows), never raw data.
  */
object ExactPercentiles {

  /** The reported percentiles, single-sourced with the oracle VALUES. */
  val Pcts: Seq[Int] = Seq(50, 90, 99)

  /** `h` must carry (`groupCol`, `valueCol`, `cnt`); returns one row per
    * (group, pct) with the exact witness value. `pcts` defaults to the
    * latency-report trio; the IQR outlier fence reads off quartiles. */
  def readoff(h: DataFrame, groupCol: String, valueCol: String,
      pcts: Seq[Int] = Pcts): DataFrame = {
    val byVal = Window.partitionBy(groupCol).orderBy(valueCol)
    val whole = Window.partitionBy(groupCol)
    h.withColumn("cum", sum("cnt").over(byVal))
      .withColumn("n", sum("cnt").over(whole))
      .withColumn("pct", explode(array(pcts.map(p => lit(p)): _*)))
      .filter(col("cum") - col("cnt") < expr("(n * pct + 99) div 100") &&
        col("cum") >= expr("(n * pct + 99) div 100"))
      .select(col(groupCol), col("pct"), col(valueCol))
      .orderBy(groupCol, "pct")
  }

  /** DuckDB spelling of [[readoff]] over a histogram CTE `histSql`
    * producing (`groupCol`, `valueCol`, cnt). */
  def sql(histSql: String, groupCol: String, valueCol: String,
      pcts: Seq[Int] = Pcts): String = {
    val vals = pcts.map(p => s"($p)").mkString(", ")
    s"""WITH h AS (
       |$histSql),
       |c AS (
       |  SELECT $groupCol, $valueCol, cnt,
       |    sum(cnt) OVER (PARTITION BY $groupCol ORDER BY $valueCol) AS cum,
       |    sum(cnt) OVER (PARTITION BY $groupCol) AS n
       |  FROM h),
       |q AS (SELECT c.*, p.pct FROM c, (VALUES $vals) p(pct))
       |SELECT $groupCol, pct, $valueCol FROM q
       |WHERE cum - cnt < (n * pct + 99) // 100
       |  AND cum >= (n * pct + 99) // 100
       |ORDER BY $groupCol, pct""".stripMargin
  }
}
