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

  test("packSequences: per-shard exclusive prefix offsets and chunk invariants") {
    val rows = TextAnalysis.packSequences(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(rows.nonEmpty)
    val B = TextAnalysis.PackBudget
    rows.foreach { case (doc, _, nTok, off, first, last, nChunks) =>
      assert(nTok >= 1 && off >= 0, s"doc $doc")
      assert(first == off / B && last == (off + nTok - 1) / B, s"doc $doc")
      assert(nChunks == last - first + 1, s"doc $doc")
      // a doc no longer than the budget can straddle at most one cut
      if (nTok <= B) assert(nChunks <= 2, s"doc $doc")
    }
    // within each (source, block) shard: offsets are the exact exclusive
    // prefix sum of token counts in doc_id order, starting at 0
    rows.groupBy { case (doc, src, _, _, _, _, _) =>
      (src, doc / TextAnalysis.PackBlock)
    }.foreach { case (shard, docs) =>
      val sorted = docs.sortBy(_._1)
      assert(sorted.head._4 == 0L, s"shard $shard")
      sorted.sliding(2).foreach {
        case Seq((_, _, nTok, off, _, _, _), (d2, _, _, off2, _, _, _)) =>
          assert(off2 == off + nTok, s"shard $shard doc $d2")
        case _ =>
      }
    }
  }

  test("packSequences: one window exchange on the shard key, no global sort before it") {
    val plan = TextAnalysis.packSequences(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    // the window partitions by (source, block) — a global-ORDER-BY window
    // would show a SinglePartition exchange feeding the Window node
    assert(plan.contains("Window"), plan.take(500))
    assert(!plan.contains("SinglePartition, ENSURE_REQUIREMENTS"),
      "window must not serialize onto one partition:\n" + plan.take(2000))
  }

  test("shuffleShards: a reproducible permutation with dense per-shard positions") {
    val rows = TextAnalysis.shuffleShards(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(rows.nonEmpty)
    // a permutation: every doc exactly once
    assert(rows.map(_._3).distinct.size == rows.size)
    rows.groupBy(_._1).foreach { case (shard, docs) =>
      assert(shard >= 0 && shard < TextAnalysis.ShuffleShards)
      // positions are dense 1..n and follow key order
      val sorted = docs.sortBy(_._2)
      assert(sorted.map(_._2) == (1L to docs.size).toSeq, s"shard $shard")
      assert(sorted.map(d => (d._4, d._3)) == docs.map(d => (d._4, d._3)).sorted,
        s"shard $shard not in key order")
    }
    // deterministic: a second construction yields the identical layout
    val again = TextAnalysis.shuffleShards(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    assert(again == rows)
  }

  test("dupSpans: every span is an 8-gram reaching >=2 docs, ranked and capped") {
    val sf = "/root/testdata/sf0.001"
    val df = TextAnalysis.dupSpans(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= TextAnalysis.DupSpanTopK)
    rows.foreach { case (gram, nDocs, nOcc) =>
      assert(gram.split(' ').length == TextAnalysis.DupSpanN, gram)
      assert(nDocs >= 2 && nOcc >= nDocs, s"$gram: $nDocs/$nOcc")
    }
    // declared total order: doc reach desc, occurrences desc, gram asc
    assert(rows.sortBy { case (g, d, o) => (-d, -o, g) }.toSeq == rows.toSeq)
    // no self-join in the plan: the census is explode + aggregate + top-k
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("charEntropy: native kernel agrees with an explode+agg spelling") {
    val sf = "/root/testdata/sf0.001"
    val df = TextAnalysis.charEntropy(spark, sf)
    val viaKernel = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaExplode = graft.Tables(spark, sf, "documents")
      .selectExpr("doc_id", "explode(split(text, '')) AS ch")
      .groupBy("doc_id", "ch").count()
      .groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.expr(
        "round(ln(sum(count)) - sum(count * ln(count)) / sum(count), 6)").as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaKernel.keySet == viaExplode.keySet)
    viaKernel.foreach { case (id, e) =>
      assert(math.abs(e - viaExplode(id)) < 1e-9, s"doc $id: $e vs ${viaExplode(id)}")
    }
  }

  test("invertedIndex: capped ascending postings, exact df, bounded-heap plan") {
    val df = TextAnalysis.invertedIndex(spark, "/root/testdata/sf0.001")
    // the posting prefix must aggregate through the bounded heap, not
    // collect_list (whose buffer is unbounded per group)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk"), plan.take(1200))
    assert(!plan.contains("collect_list"), plan.take(1200))
    // postings is a comma-joined string (driver-harness-sortable); split back
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(',').filter(_.nonEmpty).map(_.toLong).toSeq)).toSeq
    assert(rows.nonEmpty)
    rows.foreach { case (tok, dfreq, postings) =>
      assert(postings.size == math.min(dfreq, TextAnalysis.PostingsCap.toLong),
        s"token $tok")
      assert(postings == postings.sorted, s"token $tok not ascending")
      assert(postings.distinct.size == postings.size, s"token $tok dups")
    }
    // cross-check one token against a direct computation
    val (tok, dfreq, postings) = rows.maxBy(_._2)
    import spark.implicits._
    val direct = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t") === tok).select("doc_id").distinct()
      .as[Long].collect().sorted.toSeq
    assert(dfreq == direct.size)
    assert(postings == direct.take(TextAnalysis.PostingsCap))
  }

  test("contaminationNgram: totals anchor to the exact-dup check's population") {
    val ng = TextAnalysis.contaminationNgram(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val ex = TextAnalysis.contamination(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ng.nonEmpty && ex.nonEmpty)
    ex.foreach { case (split, nDocs, _) =>
      val (nDocsNg, nFlagged, nHits) = ng(split)
      // same base doc population as the exact-dup check (short docs
      // carry no shingles but still count in n_docs)
      assert(nDocsNg == nDocs, split)
      assert(nFlagged >= 0 && nFlagged <= nDocs, split)
      // every flagged doc contributes >= 1 hit shingle
      assert(nHits >= nFlagged, split)
    }
    // an exact duplicate of a long-enough train doc shares every shingle:
    // construct one and check the span-level flag directly
    import spark.implicits._
    val words = (1 to 20).map(i => s"w$i").mkString(" ")
    val probe = Seq((1L, words), (2L, words), (3L, "too short"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= TextAnalysis.ContamNgram)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(1, size(w) - ${TextAnalysis.ContamNgram} + 1),
           |  i -> md5(concat_ws(' ', slice(w, i, ${TextAnalysis.ContamNgram}))))""".stripMargin))
        .as("g"))
    val byDoc = probe.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc.keySet == Set(1L, 2L))          // the 2-token doc has no shingles
    assert(byDoc(1L) == byDoc(2L) && byDoc(1L).size == 8)  // 20 - 13 + 1
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
    val d = graft.TempDirs.create("graft-rep").toString
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
    val d = graft.TempDirs.create("graft-rare").toString
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

  // ---- round-7 corpus-model operators (TF-IDF keywords, bigram-LM
  // surprisal) on crafted corpora with KNOWN statistics: the fixture
  // oracle checks prove cross-engine agreement; these prove the
  // operators rank/score what they must.

  // 4 docs; "common" appears in every doc (idf floor(ln(5/5)*1e4) = 0),
  // "rare" only in doc 0, "spark" in docs 1+2. Token counts per doc are
  // chosen so each doc has >= 3 distinct tokens.
  private lazy val tfidfDir: String = {
    import spark.implicits._
    val d = graft.TempDirs.create("graft-textspec").toString
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
    val r = TextAnalysis.tfidf(spark, tfidfDir)
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
    import spark.implicits._
    val d = graft.TempDirs.create("graft-pplspec").toString
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
    val plan = TextAnalysis.tfidf(spark, tfidfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked into tfidf:\n$plan")
  }

  test("sampleQuota: exact per-language quotas through the bounded heap, not a window sort") {
    val sf = "/root/testdata/sf0.001"
    val df = TextAnalysis.sampleQuota(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked into sampleQuota:\n$plan")
    val rows = df.collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    assert(perLang.nonEmpty)
    perLang.foreach { case (_, g) =>
      // quota respected; ranks dense from 1 (a short language keeps all)
      assert(g.length <= TextAnalysis.QuotaPerLang)
      assert(g.map(_._2).sorted.toSeq == (1 to g.length))
    }
    // deterministic: a second run selects the identical sample
    assert(TextAnalysis.sampleQuota(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq == rows.toSeq)
  }

  test("gopherRules: pass counts are bounded, conjunctive, and non-trivial") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.gopherRules(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == rows.map(_.getString(0)).toSeq.sorted)
    var (tot, totAll) = (0L, 0L)
    val totRule = Array.fill(5)(0L)
    rows.foreach { r =>
      val n = r.getLong(1)
      val passes = (2 to 6).map(r.getLong)
      val all = r.getLong(7)
      passes.foreach(p => assert(p >= 0 && p <= n))
      // the conjunction can't beat its weakest conjunct
      assert(all <= passes.min)
      tot += n; totAll += all
      (0 until 5).foreach(i => totRule(i) += passes(i))
    }
    val nDocs = graft.Tables(spark, sf, "documents").count()
    assert(tot == nDocs)
    // every rule rejects something and accepts something at corpus level
    totRule.foreach(t => assert(t > 0 && t < tot, s"trivial rule: $t of $tot"))
    assert(totAll > 0 && totAll < tot)
  }

  test("mixWeights: shares sum to 1 and sqrt-temperature flattens the mix") {
    val rows = TextAnalysis.mixWeights(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.length == 20)
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-9)
    // w_q is the floor-quantized exact sqrt
    rows.foreach { case (_, _, nTok, wq, _) =>
      assert(wq == math.floor(math.sqrt(nTok.toDouble) * TextAnalysis.MixScale).toLong)
    }
    // flattening: the token-richest source's weight share sits below its
    // token share, the poorest source's above (what α=1/2 is FOR)
    val totTok = rows.map(_._3).sum.toDouble
    val rich = rows.maxBy(_._3)
    val poor = rows.minBy(_._3)
    assert(rich._5 < rich._3 / totTok)
    assert(poor._5 > poor._3 / totTok)
  }

  test("pplBuckets: per-lang tertiles partition the scored docs evenly") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.pplBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val scored = TextAnalysis.perplexity(spark, sf).count()
    assert(rows.map(_._3).sum == scored)
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      assert(bs.map(_._2).sorted.toSeq == Seq("head", "middle", "tail"), s"lang $lang")
      val n = bs.map(_._3).sum
      // (rn-1)*3 div n cuts exact tertiles: every bucket within 1 of n/3
      bs.foreach { case (_, _, nd, _) =>
        assert(nd >= n / 3 && nd <= n / 3 + 1, s"lang $lang bucket size $nd of $n")
      }
    }
  }

  test("dsirScores: covers every doc and ranks the target split above raw") {
    val sf = "/root/testdata/sf0.001"
    val d = TextAnalysis.dsirScores(spark, sf)
    val docs = graft.Tables(spark, sf, "documents")
    assert(d.count() == docs.count())
    // per-token mean LLR of the val (target) split must exceed train's:
    // the model was fitted to prefer exactly those docs
    val byId = d.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val splits = TextAnalysis.withSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def mean(s: String) = {
      val xs = byId.collect { case (id, (n, q)) if splits(id) == s => q.toDouble / n }
      xs.sum / xs.size
    }
    assert(mean("val") > mean("train"))
  }

  test("bpePairs: top merge candidate matches a brute-force recount") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.bpePairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(rows.length == TextAnalysis.BpeTopK)
    // ranked: counts non-increasing, pair ascending within equal counts
    rows.sliding(2).foreach { case Seq((p1, c1), (p2, c2)) =>
      assert(c1 > c2 || (c1 == c2 && p1 < p2))
    }
    // brute-force the pair counts driver-side from the same token stream
    val toks = graft.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    toks.filter(_.length >= 2).foreach { t =>
      (0 until t.length - 1).foreach { i =>
        val p = t.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1
      }
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(TextAnalysis.BpeTopK)
    assert(rows == expected)
  }

  test("bpeVocab: round 1 is bpePairs' top candidate; a driver brute-force reproduces the full merge table") {
    val sf = "/root/testdata/sf0.001"
    val vocab = TextAnalysis.bpeVocab(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4))).toSeq
    assert(vocab.map(_._1) == (1 to TextAnalysis.BpeMergeRounds))
    // round 1 from char-level init IS bpePairs' winner (pa+pb == pair)
    val top = TextAnalysis.bpePairs(spark, sf).collect().head
    assert(vocab.head._4 == top.getString(0) && vocab.head._5 == top.getLong(1))

    // driver-side BPE trainer on the same token stream: greedy
    // left-to-right merge application, (cnt desc, pair lex) argmax
    var toks = graft.Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("t"))
      .filter(col("t") =!= "").collect().map(_.getString(0))
      .filter(_.length >= 2)
      .map(t => t.map(_.toString).toVector)
    val got = (1 to TextAnalysis.BpeMergeRounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      toks.foreach { syms =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + 1
          case _ =>
        }
      }
      val ((pa, pb), cnt) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
      toks = toks.map { syms =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        syms.foreach { s =>
          if (out.nonEmpty && out.last == pa && s == pb) out(out.length - 1) = pa + pb
          else out += s
        }
        out.toVector
      }
      (r, pa, pb, pa + pb, cnt)
    }
    assert(vocab == got)
  }

  test("cmsHeavy: estimates never undercount and equal exact counts sans collision") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.cmsHeavy(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.length == TextAnalysis.CmsTopK)
    // the CMS one-sided error guarantee: min-of-rows >= true count
    rows.foreach { case (tok, exact, est) =>
      assert(est >= exact, s"CMS undercounted $tok: $est < $exact")
    }
    // report is ranked by true frequency
    assert(rows.map(-_._2).toSeq == rows.map(-_._2).toSeq.sorted)
    // d=4 independent rows over w=256 buckets: at this corpus size at
    // least one heavy hitter should see a collision-free row (est == exact)
    assert(rows.exists { case (_, exact, est) => est == exact })
  }

  test("CMS merges by cell-wise addition: per-source partial sketches sum to the single-pass sketch") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val bucket = (expr("conv(substring(md5(concat(i, ':', token)), 1, 4), 16, 10)")
      .cast("long") % TextAnalysis.CmsWidth).as("b")
    val cells = graft.Tables(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .select(col("source"), col("token"),
        explode(expr(s"sequence(0, ${TextAnalysis.CmsDepth - 1})")).as("i"))
      .select(col("source"), col("i"), bucket)
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    val direct = toMap(cells.groupBy("i", "b").agg(count(lit(1)).as("c")))
    val merged = toMap(cells.groupBy("source", "i", "b")
      .agg(count(lit(1)).as("c"))
      .groupBy("i", "b").agg(sum("c").as("c")))
    // the map-side-combine property the cmsHeavy docstring claims: a
    // per-shard sketch build followed by cell-wise addition is exactly
    // the one-pass sketch, so the structure distributes at 100 TB
    assert(direct.nonEmpty && merged == direct)
  }

  test("chunkWindows: brute-forced stride/overlap layout matches and tiles every doc") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val rows = TextAnalysis.chunkWindows(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val size = TextAnalysis.ChunkSize
    val stride = TextAnalysis.ChunkStride
    val expected = docs.toSeq.sortBy(_._1).flatMap { case (id, text) =>
      val n = 1 + math.max(0, text.length - (size - stride + 1)) / stride
      (0 until n).map { i =>
        val chunk = text.substring(i * stride, math.min(text.length, i * stride + size))
        (id, i, i * stride + 1, chunk.length, md5hex(chunk))
      }
    }
    assert(rows.toSeq == expected)
    // the final chunk of every doc reaches exactly the end of its text
    assert(expected.groupBy(_._1).forall { case (id, cs) =>
      cs.last._3 - 1 + cs.last._4 == docs(id).length
    })
    // multi-chunk docs exist at this SF (max len 558 -> up to 3 windows)
    assert(expected.exists(_._2 > 0))
  }

  test("lenHistogram: estimates within one bucket width of the exact quantiles") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.lenHistogram(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == TextAnalysis.LenHistPs)
    // exact reference quantiles (ceil-rank convention, matching the sketch)
    val lens = graft.Tables(spark, sf, "documents")
      .selectExpr("length(text) AS l").collect().map(_.getInt(0)).sorted
    rows.foreach { case (p, b, lo, est) =>
      val exact = lens((p * lens.length + 99) / 100 - 1)
      assert(lo == b * TextAnalysis.LenHistWidth)
      assert(est >= lo && est < lo + TextAnalysis.LenHistWidth)
      assert(math.abs(est - exact) <= TextAnalysis.LenHistWidth,
        s"p$p: est $est vs exact $exact")
    }
    // estimates are monotone in p
    assert(rows.map(_._4).toSeq == rows.map(_._4).toSeq.sorted)
  }

  test("dsirResample: kept quarter outscores the dropped rest in every source") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.dsirResample(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // keep fraction is the ceil quarter per source
    rows.foreach { case (src, n, k, _, _) =>
      assert(k == (n + TextAnalysis.DsirKeepDen - 1) / TextAnalysis.DsirKeepDen, src)
    }
    // the kept set must outscore the source's overall mean per token:
    // mean(kept dsir_q / kept tokens) > mean(all dsir_q / all tokens)
    val all = TextAnalysis.dsirScores(spark, sf)
      .join(TextAnalysis.withSplit(graft.Tables(spark, sf, "documents"))
        .select("doc_id", "source", "split"), Seq("doc_id"))
      .filter(org.apache.spark.sql.functions.col("split") === "train")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.sum("dsir_q").as("sq"),
        org.apache.spark.sql.functions.sum("n_tokens").as("st"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { case (src, _, _, keptTok, keptScore) =>
      val (allScore, allTok) = all(src)
      // cross-multiplied: keptScore/keptTok > allScore/allTok
      assert(keptScore * allTok > allScore * keptTok, s"source $src")
    }
  }

  test("ragFunnel: stages nest and the chunk tail anchors to the standalone operator") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.ragFunnel(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rows.map(t => (t._1, t._2)).toSeq ==
      Seq((0, "raw_docs"), (1, "quality_docs"), (2, "unique_docs"),
        (3, "chunks"), (4, "chunk_chars")))
    val n = rows.map(_._3)
    // funnel nests: quality <= raw, unique <= quality (and strictly fewer
    // here: the fixture carries permutation duplicates at every SF)
    assert(n(1) <= n(0) && n(2) < n(1))
    // chunking expands: at least one chunk per kept doc, and total chunk
    // chars at least the kept docs' char mass (overlap only adds)
    assert(n(3) >= n(2) && n(4) >= n(3))
    // the chunk tail equals the standalone operator restricted to the
    // same kept set (recomputed independently here)
    import org.apache.spark.sql.functions._
    val docs = graft.Tables(spark, sf, "documents")
    val q = TextAnalysis.quality(spark, sf)
      .filter(col("quality") === 1).select("doc_id")
    val u = docs.join(q, "doc_id")
      .groupBy(md5(concat_ws(" ",
        array_sort(array_distinct(split(col("text"), " "))))).as("fp"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    assert(u.count() == n(2))
    assert(TextAnalysis.chunkWindows(spark, sf).join(u, "doc_id").count() == n(3))
  }

  test("crossSourceProfile: per-source counts nest and totals anchor to fingerprint") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.dedup.Dedup.crossSourceProfile(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == 20)
    rows.foreach { case (src, n, nfp, dup, cross) =>
      assert(nfp <= n, src)
      // a cross-source copy is in particular a copy
      assert(cross <= dup && dup <= n, src)
    }
    // global dup population = docs minus one per distinct fingerprint is a
    // lower bound; exact anchor: docs whose fingerprint has >1 copy equals
    // n_docs - n_singleton_fps, derived from the text_fingerprint frame
    val fps = TextAnalysis.fingerprint(spark, sf).collect().map(_.getLong(1))
    val expectedDup = fps.filter(_ > 1).sum
    assert(rows.map(_._4).sum == expectedDup)
  }

  test("bpeEncode: hand-computed BPE on a crafted corpus, pair exhaustion leaves the stream intact") {
    import spark.implicits._
    // doc 1: "aaab" + "ab"; doc 2: "abab". Greedy trainer trajectory:
    //   r1 stats: (a,b):4 (a,a):2 (b,a):1        -> merge (a,b)
    //   r2 stats: (a,a):1 (a,ab):1 (ab,ab):1 tie -> lex argmax (a,a)
    //   r3 stats: (aa,ab):1 (ab,ab):1 tie        -> (aa,ab)  ["aaab" whole]
    //   r4 stats: (ab,ab):1                      -> (ab,ab)  ["abab" whole]
    //   r5 stats: EMPTY — the guard must leave the stream as-is, not
    //   empty it through the degenerate cross join
    val toks = Seq((1L, "aaab"), (1L, "ab"), (2L, "abab")).toDF("doc_id", "token")
    val out = TextAnalysis.bpeEncodeFrom(toks, rounds = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // d1: "aaab" -> [aaab], "ab" -> [ab] = 2 tokens over 6 chars
    // d2: "abab" -> [abab] = 1 token over 4 chars
    assert(out == Seq((1L, 6L, 2L), (2L, 4L, 1L)))
  }

  test("bpeEncode on the fixture: char mass conserved as an upper bound, encoding is lossy-free on count") {
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // merges concatenate, never drop: every doc's BPE token count is
    // >= 1 per non-empty token and <= its char count
    assert(rows.forall { case (_, chars, bpe) => bpe >= 1 && bpe <= chars })
    // the 5 learned merges actually fired somewhere: corpus-wide the
    // encoding is strictly shorter than character-level
    assert(rows.map(_._3).sum < rows.map(_._2).sum)
  }

  test("bpeEncodeServed: the persisted-artifact single-pass apply is row-for-row the inline encode") {
    val sf = "/root/testdata/sf0.001"
    val inline = TextAnalysis.bpeEncode(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val served = TextAnalysis.bpeEncodeServed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(served == inline)
  }
}
