package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("approx vocabulary sketch lands within 5% of the exact distinct count") {
    val r = TextAnalysis.vocabApprox(spark, "/root/testdata/sf0.001").head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("language ID guesses are deterministic and cover every doc") {
    val df = TextAnalysis.langId(spark, "/root/testdata/sf0.001")
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(df.count() == n)
    assert(df.select("lang_guess").distinct().count() >= 1)
  }
}
