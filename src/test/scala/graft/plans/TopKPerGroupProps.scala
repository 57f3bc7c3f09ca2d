package graft.plans

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property-based equivalence of the custom bounded-heap operator against
  * the window formulation it replaces, on ADVERSARIAL random data the
  * fixture cannot produce: tiny value domains (heavy ties on the ranking
  * key, resolved only by the unique tiebreak id), group counts from 0 to
  * hundreds, k from 1 up past typical group depth, both sort directions.
  * Few cases (each runs two Spark jobs), maximally hostile shapes. */
object TopKPerGroupProps extends Properties("TopKPerGroup") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxDiscardRatio(10)

  private lazy val spark = graft.TestSpark.spark

  private val rowsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(0, 300)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, 8L) // few groups → deep groups
      v <- Gen.choose(0L, 5L) // 6-value domain → massive ties
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }

  property("heap path == window path on tie-heavy random data") =
    Prop.forAll(rowsGen, Gen.choose(1, 5), Gen.oneOf(true, false)) {
      (rows, k, asc) =>
        import spark.implicits._
        val df = rows.toDF("g", "v", "id")
        val topk = TopK.perGroup(df, Seq("g"), Seq("v" -> asc, "id" -> true), k)
          .orderBy("g", "rn").collect().toSeq
        val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
          .orderBy(if (asc) col("v").asc else col("v").desc, col("id").asc)
        val win = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).orderBy("g", "rn").collect().toSeq
        topk == win
    }
}
