package graft.text

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantic pins for the corpus-model text operators (TF-IDF keywords,
  * bigram-LM surprisal) on a crafted corpus with KNOWN statistics — the
  * fixture-table oracle checks prove cross-engine agreement; these prove
  * the operators rank/score what they must. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs; "common" appears in every doc (idf floor(ln(5/5)*1e4) = 0),
  // "rare" only in doc 0, "spark" in docs 1+2. Token counts per doc are
  // chosen so each doc has >= 3 distinct tokens.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-textspec").toString
    Seq(
      (0L, "common rare rare alpha beta", "en", "s0", 27L),
      (1L, "common spark alpha alpha gamma", "en", "s0", 30L),
      (2L, "common spark beta delta delta", "en", "s1", 29L),
      (3L, "common gamma delta epsilon zeta", "en", "s1", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("tfidf: doc-unique token outranks shared ones; all-doc token scores zero") {
    val r = TextAnalysis.tfidf(spark, dir)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getInt(3)))
    // exactly TfidfK rows per doc, rn dense 1..k
    assert(r.groupBy(_._1).values.forall(_.map(_._4).sorted.toSeq == Seq(1, 2, 3)))
    // doc 0's top keyword is its private token "rare" (tf=2, df=1)
    val top0 = r.filter(x => x._1 == 0L && x._4 == 1).head
    assert(top0._2 == "rare")
    // "common" appears in all docs: idf = floor(ln((4+1)/(4+1))*1e4) = 0,
    // so its score is exactly 0 and it can never outrank a positive score
    val common = r.filter(_._2 == "common")
    assert(common.forall(_._3 == 0L))
  }

  test("perplexity: a repeated corpus-frequent bigram scores below rare ones") {
    val d = Files.createTempDirectory("graft-pplspec").toString
    Seq(
      (0L, "a b a b a b a b", "en", "s0", 15L), // only (a b)/(b a) bigrams
      (1L, "q r s t u v w x", "en", "s0", 15L), // all singleton bigrams
      (2L, "one", "en", "s0", 3L))              // 1 token -> no bigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = TextAnalysis.perplexity(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    // the 1-token doc has no bigrams and must be absent, not zero-scored
    assert(r.map(_._1) == Seq(0L, 1L))
    val byDoc = r.map(x => x._1 -> x).toMap
    assert(byDoc(0L)._2 == 7 && byDoc(1L)._2 == 7)
    // doc 0's bigrams repeat (high model probability -> low surprisal);
    // doc 1's are all corpus-singletons (low probability -> high surprisal)
    assert(byDoc(0L)._3 < byDoc(1L)._3)
    assert(r.forall(_._3 >= 0.0))
  }

  test("tfidf top-k runs through the bounded-heap operator, not a window sort") {
    val plan = TextAnalysis.tfidf(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked into tfidf:\n$plan")
  }
}
