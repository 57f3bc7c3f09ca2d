package graft.dedup

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end dedup behavior on a corpus with KNOWN duplicate structure
  * (the fixture tables are duplicate-sparse, so the oracle checks there
  * are mostly vacuous for recall; this pins that the operators actually
  * find what they must find). Doc ids are multiples of 50 so rows survive
  * ngramJaccard's 1-in-50 sample. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = graft.TempDirs.create("graft-dedup").toString
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight", "en", "s0", 51L),
      (50L, "the quick brown fox jumps over the lazy dog tonight", "en", "s0", 51L),   // exact dup of 0
      (100L, "the quick brown fox jumps over the lazy dog yesterday", "en", "s0", 53L), // near dup of 0
      (150L, "completely different words about spark shuffles and joins", "en", "s1", 57L),
      (200L, "another unrelated document mentioning window functions only", "en", "s1", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("bloom-prefiltered incremental dedup equals the unfiltered exact verdict") {
    val sf = "/root/testdata/sf0.001"
    val plain = Dedup.incrementalDedup(spark, sf)
      .select("doc_id", "is_dup_exact")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    val bloomed = Dedup.incrementalBloomDedup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    // no false negatives (Bloom guarantee) + exact confirmation join ->
    // the sketch must be invisible in the result
    assert(bloomed == plain && bloomed.nonEmpty)
  }

  test("bloom-prefiltered incremental dedup is lazy: construction runs zero jobs") {
    // the corpus sketch is a scalar subquery inside the plan, not an
    // eager .head() — building the frame must not run any SQL execution.
    // (Raw job count is the wrong probe: the parquet footer/schema read
    // at scan construction is a 1-task NON-SQL job every
    // spark.read.parquet pays, plain variant included. The old eager
    // .head() was a full SQLExecutionStart; that event is the exact
    // class being banned.)
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            jobs.add(s.description)
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val frame = Dedup.incrementalBloomDedup(spark, "/root/testdata/sf0.001")
      // listener delivery is async; construction-time jobs (the old eager
      // .head()) run synchronously, so a short drain window suffices
      Thread.sleep(1000)
      assert(jobs.isEmpty,
        s"plan construction ran SQL execution(s): ${String.join(", ", jobs)}")
      // and the plan still executes correctly after the lazy build
      assert(frame.limit(1).collect().nonEmpty)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bloom-prefiltered incremental dedup survives an all-incoming (empty-corpus) batch") {
    // every local-fixture doc_id is a multiple of 10 -> corpus side empty
    // -> the aggregated sketch is NULL -> might_contain(NULL) is NULL ->
    // nothing survives the prefilter; the verdict must be all-zeros, not
    // an NPE or a dropped row set
    val r = Dedup.incrementalBloomDedup(spark, dir)
      .collect().map(x => (x.getLong(0), x.getInt(1)))
    assert(r.map(_._1).toSeq == Seq(0L, 50L, 100L, 150L, 200L))
    assert(r.forall(_._2 == 0))
  }

  test("exact summary counts the duplicate") {
    val r = Dedup.exactSummary(spark, dir).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (5L, 4L, 1L))
  }

  test("minhash LSH surfaces the exact duplicate as a candidate pair") {
    val pairs = Dedup.minhashLsh(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 50L)), s"pairs=$pairs")
  }

  test("ngram Jaccard scores the exact dup 1.0 and the near dup above threshold") {
    val jac = Dedup.ngramJaccard(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jac((0L, 50L)) == 1.0)
    assert(jac.contains((0L, 100L)) && jac((0L, 100L)) >= 0.5, s"jac=$jac")
    assert(!jac.contains((0L, 150L)) && !jac.contains((150L, 200L)))
  }

  test("identical documents share a simhash (hamming 0 in the pair join)") {
    val pairs = Dedup.simhashPairs(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((0L, 50L)).contains(0), s"pairs=$pairs")
  }

  test("minhash kernel signatures equal the aggregate spec bit-for-bit") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val sigCol = org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinHashSignature(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 12))
    val native = graft.Tables(spark, sf, "documents")
      .select(col("doc_id"), sigCol.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +: (0 until 12).map(i => element_at(col("sig"), i + 1).as(s"h$i")): _*)
      .orderBy("doc_id").collect().toSeq
    val spec = Dedup.minhashSignaturesSpec(spark, sf)
      .orderBy("doc_id").collect().toSeq
    assert(native == spec && native.nonEmpty)
  }

  test("simhash kernel equals the 48-vote aggregate spec bit-for-bit") {
    val sf = "/root/testdata/sf0.001"
    val native = Dedup.simhash(spark, sf).collect().toSeq
    val spec = Dedup.simhashSpec(spark, sf).collect().toSeq
    assert(native == spec && native.nonEmpty)
  }

  test("components converge on a chain with diameter far beyond the round cap") {
    // A 120-node path graph (diameter 119) needs ~119 rounds under plain
    // min-label propagation — the old 25-round bound aborted. Pointer
    // jumping converges in ~log2(119) rounds.
    val chain = (0L until 119L).map(i => (i, i + 1)).toDF("src", "dst")
    val comps = Dedup.componentClusters(chain).collect().toSeq
    assert(comps.map(r => (r.getLong(0), r.getLong(1))) == Seq((0L, 120L)))
    // two disjoint chains stay separate components
    val two = ((0L until 59L).map(i => (i, i + 1)) ++
      (1000L until 1040L).map(i => (i, i + 1))).toDF("src", "dst")
    val comps2 = Dedup.componentClusters(two).collect().toSeq.sortBy(_.getLong(0))
    assert(comps2.map(r => (r.getLong(0), r.getLong(1))) == Seq((0L, 60L), (1000L, 41L)))
  }

  test("semantic dedup: decision table is internally consistent and finds drops") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.semanticDedup(spark, sf).collect().toSeq
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // full corpus covered, keep <=> no dup partner, partner is a lower id
    // in the SAME cell (the partner may itself be dropped in a similarity
    // chain a<b<c — the rule is lower-id-neighbor, not transitive-root)
    assert(rows.size == graft.Tables(spark, sf, "embeddings").count())
    rows.foreach { r =>
      val (id, cell, keep, dupOf) = (r.getLong(0), r.getInt(1), r.getBoolean(2), r.getLong(3))
      assert(keep == (dupOf == -1L))
      if (!keep) {
        assert(dupOf < id)
        assert(byId(dupOf).getInt(1) == cell, s"dup_of $dupOf not in cell $cell")
      }
    }
    val dropped = rows.count(!_.getBoolean(2))
    assert(dropped > 0 && dropped < rows.size)
  }

  test("curation funnel: stages shrink monotonically from the raw count") {
    val counts = Dedup.curationFunnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(counts.keySet == Set(0, 1, 2, 3, 4))
    assert(counts(0) == 5L) // the fixture corpus
    (1 to 4).foreach(i => assert(counts(i) <= counts(i - 1), counts.toString))
    // the exact-dup stage must remove the duplicated text
    assert(counts(2) < counts(1) || counts(1) < 5L)
  }

  test("observed curation funnel: same table as the branch spelling, and " +
    "the observe node's metrics equal the result rows") {
    val branch = Dedup.curationFunnel(spark, dir).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    val df = Dedup.curationFunnelObserved(spark, dir)
    val onePass = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(onePass == branch, "the one-pass rewrite must not change the table")
    // the inline-DQ contract (VERDICT r15 #7): the counts collected by the
    // observe node AS THE ROWS STREAMED PAST must equal the counts the
    // result aggregate computed — metrics without a second pass
    val metrics = df.queryExecution.observedMetrics
    assert(metrics.contains("curation_funnel"), metrics.keySet.toString)
    val m = metrics("curation_funnel")
    val observed = Seq("raw", "quality", "exact_dedup", "fuzzy_dedup", "train_split")
      .map(k => k -> m.getAs[Long](k)).toMap
    val fromRows = onePass.map { case (_, stage, n) => stage -> n }.toMap
    assert(observed == fromRows,
      s"observed=$observed result=$fromRows")
  }

  test("connected components partition the pair graph with min-id reps") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val comps = Dedup.components(spark, sf).collect().toSeq
    val pairs = Dedup.minhashLsh(spark, sf)
    val nodes = pairs.select(col("doc_a").as("d"))
      .union(pairs.select(col("doc_b").as("d"))).distinct().count()
    // every clustered doc is in exactly one component; no singletons
    assert(comps.map(_.getLong(1)).sum == nodes && comps.nonEmpty)
    assert(comps.forall(_.getLong(1) >= 2))
    // the representative is a member: rep id is never larger than any
    // member, so it must itself appear in the pair graph
    val nodeSet = pairs.select(col("doc_a")).union(pairs.select(col("doc_b")))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(comps.forall(r => nodeSet.contains(r.getLong(0))))
  }

  test("recall eval rows are the truth pairs with flags consistent with the candidates") {
    val sf = "/root/testdata/sf0.001"
    val eval = Dedup.recallEval(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val truth = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // the eval is exactly the truth table plus the flag column
    assert(eval.map(t => (t._1, t._2, t._3)) == truth && eval.nonEmpty)
    val cand = Dedup.minhashLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    eval.foreach { case (da, db, _, caught) =>
      assert((caught == 1) == cand.contains((da, db)), s"($da, $db)")
    }
  }

  test("keepServed: the persisted cluster map serves row-for-row the inline keep decision") {
    val sf = "/root/testdata/sf0.001"
    val inline = Dedup.keepDecision(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val served = Dedup.keepServed(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(served == inline && served.nonEmpty)
  }
}
