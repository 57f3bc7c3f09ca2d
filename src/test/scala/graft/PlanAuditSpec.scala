package graft

import graft.SparkSpec

/** Registry-wide plan audit: NO batch query may plan a CartesianProduct,
  * and BroadcastNestedLoopJoin is allowed only where it is the intended
  * shape (a corpus scan × broadcast tiny query side in the similarity
  * family — a bounded 1×N product, not an N×M blowup). Every future
  * query lands under this gate automatically, so an accidental
  * cross-join (the classic 100 TB plan bug: a dropped join key turns an
  * equi-join quadratic) fails CI instead of shipping. */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // streaming queries EXECUTE inside their builder (runToMemory); their
  // stateful plans are asserted in the streaming specs instead
  private def skip(name: String): Boolean =
    name.startsWith("stream_") || name == "tw_q2_stream_top_emoji"

  // intended broadcast 1×N products: a tiny broadcast query side against
  // the corpus scan (crossJoin(broadcast(q)) in Similarity; recall_eval's
  // ground-truth pass reuses exactly that shape)
  private val broadcastProductIntended =
    Set("sim_cosine_topk", "sim_knn_batch", "sim_range_search", "sim_hybrid_search",
      "sim_recall_eval", "sim_pq_recall", "sim_sq_recall",
      "sim_pq_trained_recall",
      // the graph recall's exact-truth pass: same broadcast-probe shape
      "sim_knn_graph_recall",
      // filtered search + its pre/post comparison: broadcast-query scans
      "sim_filtered_knn", "sim_prepost_filter",
      "sim_trunc_topk", "sim_trunc_recall", "sim_rerank", "sim_rerank_recall",
      // 1-row broadcast scalar joins (corpus-level N / vocab-size V
      // folded to a single row, then crossJoin(broadcast(...)))
      "text_tfidf", "text_perplexity", "text_ppl_buckets",
      // |terms|-row df × 1-row corpus stats, broadcast against postings
      "text_bm25",
      // 3-row × 3-row split-moments pairing
      "text_split_drift",
      // 1-row corpus count broadcast to form the decile key
      "text_vocab_growth",
      // BM25's stats product + the dense side's 1-vector broadcast scan
      "sim_rrf_fusion",
      // per-probe 1-row candidate-count × 1-row hits products + the
      // shared exact-truth broadcast pass
      "sim_probe_sweep",
      // per-depth truncated-prefix broadcast scans + the shared truth pass
      "sim_dim_sweep",
      // sketch-sized broadcast products (64-row histogram × 3-row
      // percentile list; 64-row accumulator × 1-row gmax)
      "sim_pca_power", "text_len_histogram",
      // 1-row × 1-row × 1-row: the three graph-census counts meeting in
      // a single output row; the basket total joining the 20-row lift set
      "rel_triangles", "rel_copurchase_lift",
      // per-geometry 1-row count products in the banding sweep
      "dedup_banding_sweep",
      // 5-row delay frame <=-joined to the minutes-keyed lateness
      // histogram + the 1-row total — both sides aggregate-sized
      "ev_watermark_tradeoff",
      // Q22's scalar-subquery threshold: a 1-row broadcast avg_bal
      // >-joined against the filtered customer set — the intended shape
      "rel_q22_global",
      // Q11's global-fraction cut: the 1-row broadcast total >-joined
      // against the per-part aggregate
      "rel_q11_top_parts",
      // the pHash probe set broadcast against the fingerprint scan —
      // the similarity family's bounded 1×N product in the mm family
      // (the served variant reads the same probes from the artifact)
      "mm_phash_topk", "mm_phash_served",
      // 1-row broadcast scalars: the max-week censoring bound and the
      // corpus token total joining vocab-sized frames
      "ev_growth_accounting", "text_collocations",
      // bucketed two-pass prefix sums (r18 — the unpartitioned-window
      // kills): 1-row range stats broadcast onto the frame + the
      // ≤(Buckets+1)-row triangular offset self-join, plus rfm's 1-row
      // user count for the NTile arithmetic
      "ev_peak_concurrency", "ev_rfm")

  test("no batch query plans a cartesian product or an unintended nested-loop join") {
    val names = SparkEntry.queries.keys.toSeq.sorted.filterNot(skip)
    assert(names.size >= 80)
    val offenders = names.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      val cartesian = plan.contains("CartesianProduct")
      val bnl = plan.contains("BroadcastNestedLoopJoin") &&
        !broadcastProductIntended(name)
      if (cartesian) Some(s"$name: CartesianProduct")
      else if (bnl) Some(s"$name: BroadcastNestedLoopJoin")
      else None
    }
    assert(offenders.isEmpty, s"unintended product joins:\n${offenders.mkString("\n")}")
  }

  /** Pushdown gate: where a rel_* query filters a scanned base column
    * with a literal predicate, that column must appear inside a
    * non-empty `PushedFilters: [...]` clause of the physical plan — a
    * refactor that lifts a predicate off the scan (e.g. by rephrasing it
    * through a non-pushable expression) fails here instead of silently
    * re-reading the full table at 100 TB. Enumerated per query: only
    * literal predicates on base columns push; join-derived or
    * aggregate-derived filters legitimately cannot. */
  private val expectedPushdown: Map[String, Seq[String]] = Map(
    "rel_q1_pricing" -> Seq("l_shipdate"),
    "rel_q3_topk" -> Seq("c_mktsegment", "o_orderdate", "l_shipdate"),
    "rel_q5_region_rev" -> Seq("r_name", "o_orderdate"),
    "rel_q6_rev_filter" -> Seq("l_shipdate", "l_discount", "l_quantity"),
    "rel_window_lag" -> Seq("o_custkey"),
    "rel_intersect" -> Seq("o_orderdate"),
    "rel_except" -> Seq("o_orderdate"),
    "rel_union" -> Seq("o_orderdate"),
    "rel_corr_subquery" -> Seq("c_custkey"),
    "rel_merge_upsert" -> Seq("o_custkey", "c_custkey"),
    "rel_q8_market_share" -> Seq("p_type", "r_name", "o_orderdate"),
    "rel_q12_priority_class" -> Seq("l_shipdate"),
    "rel_q15_top_supplier" -> Seq("l_shipdate"),
    "rel_q17_small_qty" -> Seq("p_brand", "p_size"),
    "rel_q21_waiting" -> Seq("o_orderstatus"),
    "rel_q2_min_cost" -> Seq("p_type", "p_size", "r_name"),
    "rel_q9_profit" -> Seq("p_name"),
    "rel_q13_custdist" -> Seq("o_orderpriority"),
    "rel_q16_supplier_cnt" -> Seq("p_brand", "p_type", "p_size", "s_acctbal"),
    "rel_q20_excess_stock" -> Seq("p_name", "l_shipdate", "n_name"),
    // the DQ audit's domain rule is a literal predicate on the scan; the
    // referential/modulo branches legitimately cannot push
    "rel_dq_audit" -> Seq("o_totalprice"))

  test("literal predicates on scanned base columns reach PushedFilters") {
    // the default 100-char metadata truncation would eat long pushed-filter
    // lists (and their closing bracket) out of the plan string
    val lenKey = "spark.sql.maxMetadataStringLength"
    val prevLen = spark.conf.get(lenKey)
    spark.conf.set(lenKey, "10000")
    try {
      val pushedRe = "PushedFilters: \\[[^\\]]+\\]".r
      val missing = expectedPushdown.toSeq.sortBy(_._1).flatMap { case (name, cols) =>
        val plan = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
        val pushed = pushedRe.findAllIn(plan).mkString("\n")
        cols.filterNot(pushed.contains).map(c => s"$name: $c not in pushed filters")
      }
      assert(missing.isEmpty, s"unpushed predicates:\n${missing.mkString("\n")}")
    } finally spark.conf.set(lenKey, prevLen)
  }
}
