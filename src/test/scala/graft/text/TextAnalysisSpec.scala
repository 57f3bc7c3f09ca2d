package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  test("approx vocabulary sketch lands within 5% of the exact distinct count") {
    val r = TextAnalysis.vocabApprox(spark, "/root/testdata/sf0.001").head()
    val (approx, exact) = (r.getLong(0), r.getLong(1))
    assert(exact > 0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("vocabExact (oracle-gated) agrees with vocabApprox's exact column") {
    val exactOnly = TextAnalysis.vocabExact(spark, "/root/testdata/sf0.001").head().getLong(0)
    val paired = TextAnalysis.vocabApprox(spark, "/root/testdata/sf0.001").head().getLong(1)
    assert(exactOnly == paired && exactOnly > 0)
  }

  test("winnow: native kernel is row-identical to the column-expression spec") {
    val nat = TextAnalysis.winnow(spark, "/root/testdata/sf0.001").collect().toSeq
    val spec = TextAnalysis.winnowSpec(spark, "/root/testdata/sf0.001").collect().toSeq
    assert(nat == spec && nat.nonEmpty)
  }

  test("winnow native kernel: code-point semantics match split('')+ascii on non-ASCII") {
    import spark.implicits._
    // é (2-byte UTF-8) and 😀 (4-byte, supplementary): Spark regex
    // splitting is per code point, so each is ONE hash unit
    val df = Seq((1L, "café breve café brevissimo"), (2L, "😀😀😀 emoji run here"))
      .toDF("doc_id", "text")
    df.createOrReplaceTempView("winnow_nn")
    val fps = org.apache.spark.sql.GraftBridge.column(
      graft.functions.WinnowFingerprints(
        org.apache.spark.sql.GraftBridge.expression(col("text")),
        TextAnalysis.KGram, TextAnalysis.WinnowWindow))
    val nat = df.select(col("doc_id"), fps.as("fps")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    val spec = df
      .withColumn("cs", expr("transform(split(text, ''), c -> ascii(c))"))
      .withColumn("hashes", expr(TextAnalysis.kgramHashExprForTest))
      .withColumn("fps", array_distinct(expr(
        s"transform(sequence(0, size(hashes) - ${TextAnalysis.WinnowWindow}), w -> array_min(slice(hashes, w + 1, ${TextAnalysis.WinnowWindow})))")))
      .select(col("doc_id"), col("fps")).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSeq
    assert(nat == spec)
  }

  test("winnow: BIGINT rolling-hash scheme matches the md5 parity path structurally") {
    val fast = TextAnalysis.winnow(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_fps").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val md5 = TextAnalysis.winnowMd5(spark, "/root/testdata/sf0.001")
      .select("doc_id", "n_fps").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // both schemes fingerprint exactly the same documents
    assert(fast.keySet == md5.keySet && fast.nonEmpty)
    // winnowing density: every 4-window of k-grams contributes one selection,
    // so per doc the distinct-fp count is positive and bounded by the k-gram count
    fast.foreach { case (id, n) => assert(n >= 1 && n <= md5(id) * 4 + 3, s"doc $id n_fps=$n") }
  }

  test("winnow hashes are partition-invariant (exact BIGINT arithmetic)") {
    val a = TextAnalysis.winnow(spark, "/root/testdata/sf0.001").collect().toSeq
    val b = TextAnalysis.winnow(spark, "/root/testdata/sf0.001")
      .repartition(7).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("BPE pre-tokenizer regex splits contractions, words, digits, punct runs") {
    import spark.implicits._
    val pieces = Seq("don't stop... 123 times!")
      .toDF("text")
      .select(regexp_extract_all(col("text"), lit(TextAnalysis.BpePretokenRegex), lit(0)))
      .head().getSeq[String](0)
    assert(pieces == Seq("don", "'t", " stop", "...", " 123", " times", "!"))
  }

  test("repetition signals: a looping doc gates repetitive, a diverse one doesn't") {
    import spark.implicits._
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-rep").toString
    Seq(
      (1L, "spam spam spam spam spam ham", "en", "s", 28L),
      (2L, "one two three four five six seven", "en", "s", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.repetition(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val looping = rows(1L)
    assert(looping.getAs[Long]("n_tokens") == 6 && looping.getAs[Long]("n_types") == 2)
    assert(looping.getAs[Double]("top_bigram_ratio") == 4.0 / 5)  // "spam spam" ×4
    assert(looping.getAs[Int]("repetitive") == 1)
    val diverse = rows(2L)
    assert(diverse.getAs[Double]("dup_ratio") == 0.0)
    assert(diverse.getAs[Int]("repetitive") == 0)
  }

  test("PII scrub removes every synthesized email and digit run") {
    val out = TextAnalysis.piiScrub(spark, "/root/testdata/sf0.001")
    import org.apache.spark.sql.functions._
    // every doc_id % 7 == 0 got an email appended; scrub must count it once
    // and the scrubbed text must contain the placeholder and no '@'
    val scrubbed = out.filter(col("doc_id") % 7 === 0)
    assert(scrubbed.filter(col("n_emails") =!= 1).count() == 0)
    assert(scrubbed.filter(!col("scrubbed").contains("<EMAIL>")).count() == 0)
    assert(out.filter(col("scrubbed").rlike(TextAnalysis.EmailRe)).count() == 0)
    assert(out.filter(col("scrubbed").rlike(TextAnalysis.DigitRunRe)).count() == 0)
    // untouched docs pass through verbatim (no emails, no digit runs)
    assert(out.filter(col("n_emails") === 0 && col("n_digit_runs") === 0)
      .filter(col("scrubbed").contains("<")).count() == 0)
  }

  test("rare-token ratio: singleton-vocabulary docs score 1.0") {
    import spark.implicits._
    import java.nio.file.Files
    val d = Files.createTempDirectory("graft-rare").toString
    // "the" appears in all three docs (df=3 > RareDf=2 → common);
    // every other token is unique to its doc (df=1 → rare)
    Seq(
      (1L, "the the common", "en", "s", 14L),
      (2L, "the words too", "en", "s", 13L),
      (3L, "the zzyzx qwfp", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.rareRatio(spark, d).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(rows(1L) == 0.5)          // types {the, common}: 1 of 2 rare
    assert(rows(2L) == 2.0 / 3)      // {the, words, too}: 2 of 3 rare
    assert(rows(3L) == 2.0 / 3)
    assert(rows.size == 3)
  }

  test("language ID guesses are deterministic and cover every doc") {
    val df = TextAnalysis.langId(spark, "/root/testdata/sf0.001")
    val n = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").count()
    assert(df.count() == n)
    assert(df.select("lang_guess").distinct().count() >= 1)
  }

  test("mix report: shares sum to 1 and doc counts agree with split_assign") {
    val sf = "/root/testdata/sf0.001"
    val mix = TextAnalysis.mixReport(spark, sf).collect()
    assert(math.abs(mix.map(_.getDouble(4)).sum - 1.0) < 1e-9)
    val mixDocs = mix.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val splitDocs = TextAnalysis.splitAssign(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mixDocs == splitDocs)
    // token totals are positive everywhere (no empty-cell artifacts)
    assert(mix.forall(_.getLong(3) > 0))
  }
}
