package graft.similarity

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** ANN quality contracts: multi-probe must dominate single-probe recall
  * against the exact ground truth (its entire reason to exist), and the
  * candidate sets must nest the way the cell geometry promises. */
class SimilaritySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def bruteTop3: Map[Long, Set[Long]] = {
    val emb = graft.Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val q = emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("cos_r"), asc("vec_id"))
    emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(graft.functions.VectorOps.cosine("embedding", "qe"), 4).as("cos_r"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
  }

  private def hits(df: org.apache.spark.sql.DataFrame, truth: Map[Long, Set[Long]]): Map[Long, Int] =
    df.collect().groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.map(_.getLong(1)).count(truth.getOrElse(k, Set.empty))
    }

  test("PQ: full result shape, repartition-stable, and ADC never beats distance zero") {
    val r = Similarity.pqTopK(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    // 4 queries × k=3, ranks dense 1..3, exact-integer scores are
    // non-negative (BIGINT sums of squares)
    assert(r.map(_._1).distinct.size == 4)
    assert(r.groupBy(_._1).values.forall(_.map(_._4).sorted == Seq(1, 2, 3)))
    assert(r.forall(_._3 >= 0L))
    // exact integer arithmetic end to end: a different shuffle layout must
    // reproduce the identical ranking (a float ADC would 1-ulp-drift).
    // Actually change the partitioning for the second pass — a re-run
    // under the same conf proves nothing.
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val again = try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      Similarity.pqTopK(spark, sf)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(r == again)
  }

  test("knnBatch plans the bounded-heap TopKPerGroup operator, not a window sort") {
    val q = Similarity.knnBatch(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    // two-phase: map-side partial heap + distribution-requiring final —
    // and NO window (whose physical plan sorts each query partition's
    // ~|corpus| scored rows before discarding all but k)
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked back into knnBatch:\n$plan")
    // and it selects the same neighbors as the window spelling
    val truth = bruteTop3
    val got = q.filter(col("qid") < 4).collect()
      .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    assert(got == truth, s"got=$got truth=$truth")
  }

  test("truncTopK and rerankTopK plan the bounded-heap TopKPerGroup, not a window sort") {
    // the two-stage retrieval rankings go through the same bounded-heap
    // operator as knnBatch: stage 1 scores |corpus| rows per query, so a
    // row_number window would sort corpus-sized qid partitions
    for ((name, df) <- Seq(
        "truncTopK" -> Similarity.truncTopK(spark, sf),
        "rerankTopK" -> Similarity.rerankTopK(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
        s"expected two-phase TopKPerGroup in $name plan:\n$plan")
      assert(!plan.contains("Window"), s"window sort leaked back into $name:\n$plan")
    }
  }

  test("ivf/pq retrieval rankings also go through the bounded heap (no per-query window sort)") {
    // round-10 consistency sweep: every per-qid ranking in the family —
    // IVF (label-seeded, trained, multiprobe) and PQ's ADC ranking —
    // uses the two-phase TopKPerGroup operator. The remaining Window
    // nodes (argmin over |centroids|-sized vec_id partitions, the PQ
    // encode over |codebook|-sized (vec_id, sub) partitions) rank
    // FIXED-size partitions and are fine; per-QUERY partitions grow with
    // the corpus and are not.
    for ((name, df) <- Seq(
        "ivfTopK" -> Similarity.ivfTopK(spark, sf),
        "ivfTrainedTopK" -> Similarity.ivfTrainedTopK(spark, sf),
        "ivfMultiprobe" -> Similarity.ivfMultiprobe(spark, sf),
        "pqTopK" -> Similarity.pqTopK(spark, sf))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
        s"expected two-phase TopKPerGroup in $name plan:\n$plan")
    }
  }

  test("trained PQ: one batched loop trains all subspaces, dims partition correctly") {
    val m = Similarity.PqSubspaces
    val books = Similarity.pqTrainedCodebooks(spark, sf, m).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue))
    // every subspace trained; each (c_label, sub) codeword spans exactly
    // its dim-range block (dim div sl == sub)
    assert(books.map(_._2).distinct.sorted.toSeq == (0L until m).toSeq)
    val d = books.map(_._3).max + 1
    val sl = d / m
    books.foreach { case (_, sub, dim, _) =>
      assert(dim / sl == sub, s"dim $dim landed in subspace $sub (sl=$sl)")
    }
    // and the retrieval ranks through the bounded heap
    val plan = Similarity.pqTrainedTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["))
  }

  test("SQ: codes bounded to the level grid, per-dim extremes hit both ends") {
    val codes = Similarity.sqQuantized(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(codes.nonEmpty)
    // affine map contract: every code in [0, SqLevels]; each dimension's
    // min maps to 0 and max to SqLevels exactly (floor((mx-mn)/(mx-mn)*L))
    assert(codes.forall(c => c._2 >= 0L && c._2 <= Similarity.SqLevels))
    val byDim = codes.groupBy(_._1).values
    assert(byDim.forall(_.exists(_._2 == 0L)))
    assert(byDim.forall(_.exists(_._2 == Similarity.SqLevels)))
  }

  test("SQ top-k: bounded-heap plan, dense ranks, and sane recall vs exact MIPS") {
    val q = Similarity.sqTopK(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup [") && plan.contains("TopKPerGroupPartial ["),
      s"expected two-phase TopKPerGroup in plan:\n$plan")
    assert(!plan.contains("Window"), s"window sort leaked into sqTopK:\n$plan")
    val r = q.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    assert(r.map(_._1).distinct.size == Similarity.SqQueries)
    assert(r.groupBy(_._1).values.forall(_.map(_._4).sorted == Seq(1, 2, 3)))
    // SQ is a MAX-INNER-PRODUCT search (quantized dot, unnormalized) —
    // its ground truth is the exact double dot product, NOT the cosine
    // family's normalized ranking. Across the query set the int8 grid
    // must recover most of the exact MIPS top-3; the bound is slack
    // against reshuffles, not a quality claim.
    val emb = graft.Tables(spark, sf, "embeddings").select(col("vec_id"), col("embedding"))
    val qs = emb.filter(col("vec_id") < Similarity.SqQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(desc("dot"), asc("vec_id"))
    val mipsTruth = emb.crossJoin(broadcast(qs)).filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        graft.functions.VectorOps.dot("embedding", "qe").as("dot"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .collect().groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }
    val h = hits(q.select(col("qid"), col("vec_id")), mipsTruth)
    assert(h.values.sum >= 2 * Similarity.SqQueries, s"SQ recall collapsed: $h")
  }

  test("SQ recall eval: anchored on the query set with recall in [0,1]") {
    val r = Similarity.sqRecallEval(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSeq
    // every query vector reports, even one with zero recalled neighbors
    assert(r.map(_._1) == (0L until Similarity.SqQueries.toLong).toSeq)
    assert(r.forall(x => x._2 >= 0L && x._2 <= 3L && x._3 >= 0.0 && x._3 <= 1.0))
    // the int8 grid against its own metric's exact truth: mostly recalled
    assert(r.map(_._2).sum >= 2 * Similarity.SqQueries, s"SQ recall collapsed: $r")
  }

  test("IVF-PQ: probing all cells degenerates to plain PQ exactly") {
    // with probes >= |cells| the candidate set is the whole corpus, so
    // the composed index must reproduce pqTopK row-for-row — tying the
    // composition to its two independently-verified halves
    val nCells = graft.Tables(spark, sf, "embeddings")
      .select(col("label")).distinct().count().toInt
    val composed = Similarity.ivfPqTopK(spark, sf, probes = nCells)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    val plain = Similarity.pqTopK(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    assert(composed == plain && composed.nonEmpty)
  }

  test("IVF-PQ: default probes yield dense per-query ranks from probed cells only") {
    val r = Similarity.ivfPqTopK(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getInt(3))).toSeq
    assert(r.nonEmpty && r.forall(_._3 >= 0L))
    // ranks dense from 1 per query (a query with < k candidates keeps
    // what its probed cells hold — that is the recall trade, not a bug)
    assert(r.groupBy(_._1).values.forall { rows =>
      rows.map(_._4).sorted.toSeq == (1 to rows.size).toSeq
    })
    // every returned candidate is STORED in one of its query's probe cells
    val probes = Similarity.cellCandidates(spark, sf, Similarity.MultiprobeProbes)
      .filter(col("vec_id") < 4)
      .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getAs[Number](1).longValue).toSet }
    val stored = Similarity.cellAssignments(spark, sf)
      .collect().map(x => x.getLong(0) -> x.getAs[Number](1).longValue).toMap
    assert(r.forall { case (qid, vid, _, _) => probes(qid).contains(stored(vid)) })
  }

  test("PQ encoding: every corpus vector carries exactly m codes, all valid labels") {
    import spark.implicits._
    val m = Similarity.PqSubspaces
    val labels = graft.Tables(spark, sf, "embeddings")
      .select(col("label").cast("long")).distinct().as[Long].collect().toSet
    val n = graft.Tables(spark, sf, "embeddings").count()
    val codes = Similarity.pqCodes(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue))
    // the compression contract: m codes per vector, each a codebook label
    assert(codes.length == n * m)
    assert(codes.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq == (0L until m).toSeq))
    assert(codes.forall(c => labels.contains(c._3)))
  }

  test("PQ with one subspace degenerates to the IVF coarse quantizer exactly") {
    // m=1 makes the single codeword-per-vector argmin the same
    // computation as cellAssignments — the two indexes must agree
    // bit-for-bit, tying PQ's codebook spec to the IVF one
    val pq1 = Similarity.pqCodes(spark, sf, m = 1)
      .select(col("vec_id"), col("code").cast("long").as("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ivf = Similarity.cellAssignments(spark, sf)
      .select(col("vec_id"), col("cell").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pq1 == ivf && pq1.nonEmpty)
  }

  test("PQ recall eval: anchored on the query set with recall in [0,1]") {
    val r = Similarity.pqRecallEval(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(r.forall(x => x._2 >= 0L && x._2 <= 3L && x._3 >= 0.0 && x._3 <= 1.0))
  }

  test("truncation recall: anchored on the query set, in [0,1], and the " +
      "8-dim index really ignores the tail dims") {
    val r = Similarity.truncRecallEval(spark, sf)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(r.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(r.forall(x => x._2 >= 0L && x._2 <= 3L && x._3 >= 0.0 && x._3 <= 1.0))
    // the truncated score must equal the full cosine computed on the
    // sliced prefix — i.e. dims beyond TruncDims cannot influence ranks
    val ans = Similarity.truncTopK(spark, sf).collect()
    assert(ans.nonEmpty && ans.forall(x => x.getInt(3) >= 1 && x.getInt(3) <= 3))
    assert(ans.forall(x => math.abs(x.getDouble(2)) <= 1.0001))
  }

  test("rerank recall dominates truncated-only recall per query (structural)") {
    // both stages pick from the SAME candidate set; rerank orders it by
    // the true full-dim score, so any truth member among the candidates
    // must land in rerank's top-3
    val trunc = Similarity.truncRecallEval(spark, sf)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val rr = Similarity.rerankRecallEval(spark, sf)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(rr.keySet == trunc.keySet && rr.keySet == Set(0L, 1L, 2L, 3L))
    rr.keySet.foreach { q =>
      assert(rr(q) >= trunc(q), s"query $q: rerank ${rr(q)} < trunc ${trunc(q)}")
    }
  }

  test("multi-probe IVF recall dominates single-probe against exact ground truth") {
    val truth = bruteTop3
    val single = hits(Similarity.ivfTopK(spark, sf), truth)
    val multi = hits(Similarity.ivfMultiprobe(spark, sf), truth)
    assert(truth.keySet == Set(0L, 1L, 2L, 3L))
    truth.keySet.foreach { q =>
      assert(multi.getOrElse(q, 0) >= single.getOrElse(q, 0), s"query $q regressed")
    }
    assert(multi.values.sum > single.values.sum,
      s"expected a strict total-recall gain: single=$single multi=$multi")
  }

  test("recall eval reports 0 for a query whose IVF cell is a singleton") {
    import spark.implicits._
    // vec 0 sits alone in its own label's cell, far from everything;
    // single-probe IVF returns NO candidates for it — the report must
    // still carry the row with recall 0, not drop it
    val dir = graft.TempDirs.create("graft-recall0").toString
    (Seq((0L, Seq(10.0f, 0.0f), 0)) ++
      (1L to 5L).map(i => (i, Seq(0.0f, 1.0f + i * 0.01f), 1)))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.recallEval(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.keySet == Set(0L, 1L, 2L, 3L))
    assert(rows(0L) == ((0L, 0.0)), s"singleton-cell query must report 0: $rows")
    // queries in the populated cell find their true neighbors
    assert(rows(1L)._1 > 0L)
  }

  test("probe cells nest: rank-1 candidate cell IS the storage assignment") {
    val one = Similarity.cellAssignments(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val two = Similarity.cellCandidates(spark, sf, 2)
    assert(two.filter(col("rk") === 1).collect()
      .forall(r => one(r.getLong(0)) == r.getInt(1)))
    // every vector gets exactly 2 distinct probe cells
    val byVec = two.collect().groupBy(_.getLong(0))
    assert(byVec.values.forall(rs => rs.length == 2 && rs.map(_.getInt(1)).distinct.length == 2))
  }

  test("kmeansIter: refined cells partition the corpus on the storage assignment") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.kmeansIter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val assign = Similarity.cellAssignments(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1))
    // member counts are per-cell constants across dims and reproduce the
    // assignment's cell histogram exactly
    val byCell = rows.groupBy(_._1)
    val hist = assign.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(byCell.keySet == hist.keySet)
    byCell.foreach { case (cell, rs) =>
      assert(rs.map(_._3).distinct.toSeq == Seq(hist(cell)), s"cell $cell")
    }
    // every cell refines the full dimension grid
    val nDims = rows.map(_._2).max + 1
    byCell.values.foreach(rs => assert(rs.map(_._2).sorted.toSeq == (0 until nDims)))
    // the refined quantized components live on the same grid the
    // assignment broadcasts: |cq| bounded by 1024·max|component| (unit-ish
    // embeddings -> well inside ±4096)
    assert(rows.forall { case (_, _, _, cq) => math.abs(cq) <= 4096 })
  }

  test("centroidShift: shift equals the recomputed per-cell grid delta and finds movement") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.centroidShift(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    // recompute from the two composed outputs
    val next = Similarity.kmeansIter(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getLong(3))).toMap
    val init = graft.Tables(spark, sf, "embeddings")
      .select(org.apache.spark.sql.functions.col("label"),
        org.apache.spark.sql.functions.posexplode(
          org.apache.spark.sql.functions.col("embedding")))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getFloat(2)))
      .groupBy(_._1).view.mapValues { vs =>
        // mirror the engine arithmetic: exact-decimal sum (from the
        // float's shortest string form), ONE double division, floor·1024
        val ds = vs.map(v => BigDecimal(v._2.toString))
        math.floor(ds.sum.toDouble / ds.length * 1024).toLong
      }.toMap
    val expected = next.keys.toSeq.groupBy(_._1).toSeq.sortBy(_._1).map { case (cell, ks) =>
      // ks must be a Seq: mapping over a key SET would collapse equal
      // squared deltas before the sum
      val s = ks.map(k => { val d = next(k) - init(k); d * d }).sum
      (cell, s, ks.size.toLong)
    }
    assert(rows.toSeq == expected && rows.nonEmpty)
    // at least one cell moved in round one (the seed labels are not the
    // converged clustering), and every shift is non-negative by form
    assert(rows.exists(_._2 > 0))
  }

  test("pcaPowerIter: brute-forced X'X·v0 matches and v_next lands on the ±1024 grid") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.pcaPowerIter(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val emb = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray)
    val d = emb.head.length
    assert(rows.map(_._1).toSeq == (0 until d))
    // brute-force the accumulator in exact Long arithmetic
    val expAcc = Array.fill(d)(0L)
    emb.foreach { e =>
      val q = e.map(x => math.floor(x.toDouble * 1024).toLong)
      val dv = q.sum
      (0 until d).foreach(j => expAcc(j) += q(j) * dv)
    }
    assert(rows.map(_._2).toSeq == expAcc.toSeq)
    // renorm: the max-|acc| dim hits exactly ±1024; all magnitudes bounded;
    // signs survive the sign-split division
    val gmax = expAcc.map(math.abs).max
    rows.foreach { case (j, acc, vn) =>
      assert(vn == math.signum(acc) * (math.abs(acc) * 1024L / gmax), s"dim $j")
    }
    assert(rows.map(t => math.abs(t._3)).max == 1024L)
  }

  test("trained IVF: converged-centroid assignment, same retrieval contract as label-seeded") {
    val sf = "/root/testdata/sf0.001"
    val rows = Similarity.ivfTrainedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      // per query: <=3 ranked candidates, ranks dense from 1, scores
      // non-increasing in rank — the ivfTopK output contract exactly
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sorted.reverse.toSeq)
      assert(sorted.length <= 3)
    }
    // pinned on the deterministic fixture: no query lands in a singleton
    // trained cell, so the trained index answers the same query set as
    // the label-seeded one (in general a singleton cell CAN mute a
    // query — that trade is what sim_recall_eval measures)
    val seeded = Similarity.ivfTopK(spark, sf).collect().map(_.getLong(0)).distinct
    assert(rows.map(_._1).distinct.sorted.sameElements(seeded.sorted))
  }

  test("served IVF/PQ equal their trained siblings row-for-row (build/serve split)") {
    val sf = "/root/testdata/sf0.001"
    // force a cold build so the pin covers the full persist-then-read path,
    // not an artifact left over from a previous suite run
    val root = java.nio.file.Paths.get(IndexStore.Root)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }
    def ivfRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    def pqRows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(ivfRows(Similarity.ivfServedTopK(spark, sf)) ==
      ivfRows(Similarity.ivfTrainedTopK(spark, sf)),
      "persisted-index IVF serve must reproduce the inline-trained ranking")
    assert(pqRows(Similarity.pqServedTopK(spark, sf)) ==
      pqRows(Similarity.pqTrainedTopK(spark, sf)),
      "persisted-index PQ serve must reproduce the inline-trained ranking")
    // WARM serve must not retrain: the artifacts now exist for this sf, so
    // a second call reads them back — and a marker for a DIFFERENT sf dir
    // must invalidate (the stale-index guard)
    val warm = ivfRows(Similarity.ivfServedTopK(spark, sf))
    assert(warm == ivfRows(Similarity.ivfTrainedTopK(spark, sf)))
    // round 12: the sf marker lives INSIDE the published version dir
    // (reached through the atomic symlink), never as a desyncable sidecar
    val link = root.resolve("ivf_assign")
    assert(java.nio.file.Files.isSymbolicLink(link),
      "published artifact must be an atomic symlink, not a mutable dir")
    val marker = link.toRealPath().resolve(IndexStore.SfMarker)
    assert(java.nio.file.Files.readString(marker).trim ==
      java.nio.file.Paths.get(sf).normalize().toString)
  }
}
