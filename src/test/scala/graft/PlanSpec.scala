package graft

import org.apache.spark.sql.functions._

/** Physical-plan regression tests: the 100 TB-posture properties SURVEY.md §7
  * promises. These read `.queryExecution.executedPlan` — if a refactor ever
  * reintroduces a |Q|×|N| shuffle or drops a broadcast, these fail before any
  * benchmark does.
  */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf0001).queryExecution.executedPlan.toString

  test("kNN plan scans the corpus once — no |Q|×|N| join fan-out") {
    val p = plan("q01_knn_l2")
    assert(p.contains("batch_topk"), s"no batch_topk aggregate in:\n$p")
    assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
      s"kNN reintroduced a per-(query,vector) join:\n$p")
  }

  test("contrastive mining scans the corpus ONCE, label-aware, partial map-side") {
    // r9 verdict item 4: pre-r10 these looped one batch_topk scan per label
    // value — |labels| passes over the corpus. Now one labeled_batch_topk
    // aggregate carries both buffers; the plan has exactly one parquet scan.
    for (name <- Seq("q95_hard_negatives", "q142_triplet_mine")) {
      val p = plan(name)
      assert(p.contains("labeled_batch_topk"), s"$name: no labeled aggregate:\n$p")
      assert(p.contains("partial_labeled_batch_topk"),
        s"$name: top-k not partial-aggregated map-side:\n$p")
      val scans = "Scan parquet".r.findAllIn(p).length
      assert(scans == 1, s"$name: expected ONE corpus scan, found $scans:\n$p")
      assert(!p.contains("NestedLoopJoin") && !p.contains("CartesianProduct"),
        s"$name: per-(anchor,vector) join reintroduced:\n$p")
    }
  }

  test("kNN plan aggregates top-k map-side (partial before exchange)") {
    val p = plan("q01_knn_l2")
    assert(p.contains("partial_batch_topk"), s"no partial batch topk in:\n$p")
  }

  test("join-formulated kNN broadcasts queries and aggregates partially") {
    import graft.operators.Knn
    val q = Tables.ordersQuery(spark, sf0001).where(col("query_id") < 5)
    val corpus = Tables.lineitemVec(spark, sf0001)
    val agg = Knn.searchAggViaJoin(q, corpus, 3)
    val p = agg.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"), s"no broadcast in:\n$p")
    assert(p.contains("partial_topk_by_distance"), s"no partial topk in:\n$p")
    // and it must agree with the single-scan aggregate form
    val viaAgg = Knn.searchAgg(q, corpus, 3)
    assert(agg.select(col("query_id"), explode(col("nn")).as("r")).orderBy("query_id", "r.id")
        .collect().toSeq ==
      viaAgg.select(col("query_id"), explode(col("nn")).as("r")).orderBy("query_id", "r.id")
        .collect().toSeq)
  }

  test("TPC-H Q1 scan prunes to the referenced columns only") {
    val p = plan("q20_tpch_q1")
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_shipdate"), "q1 scan reads an unused column")
    assert(!p.contains("l_partkey"), "q1 scan reads an unused column")
  }

  test("TPC-H Q3 broadcasts the filtered dimension and pushes the filter down") {
    val p = plan("q44_tpch_q3")
    assert(p.contains("BroadcastHashJoin"), s"no broadcast hash join in:\n$p")
    assert(p.contains("PushedFilters") || p.contains("FURNITURE"),
      s"mktsegment filter not near the scan:\n$p")
  }

  test("filtered search pushes the meta predicate below the ranking") {
    val df = SparkEntry.queries("q04_knn_filtered")(spark, sf0001)
    val p = df.queryExecution.optimizedPlan.toString
    // the filter must sit under the aggregate, not above it
    val aggIdx = p.indexOf("Aggregate")
    val notAf = p.indexOf("NOT (")
    assert(notAf > aggIdx && aggIdx >= 0,
      s"meta filter not pushed below the topk aggregate:\n$p")
  }

  test("SPANN stage-2 is the fused probe aggregate — one posting scan, no join fan-out") {
    // r16 fusion: the unbucketed/unfiltered stage-2 runs as ONE
    // spann_probe_topk aggregate over the posting scan (candidates + query
    // batch ride inside it); no joined row is materialized, partials merge
    // map-side. The bucketed (disk-resident) form keeps the DPP join —
    // covered by the stored-index PlanSpec entries.
    val p = plan("q08_spann_search")
    assert(p.contains("spann_probe_topk"), s"fused probe aggregate missing:\n$p")
    assert(p.contains("partial_spann_probe_topk"),
      s"probe aggregate must be partial (map-side) before the exchange:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("ShuffledHashJoin"), s"stage-2 should not join:\n$p")
  }

  test("optimizer rewrites window top-k to the bounded aggregate") {
    import graft.operators.Knn
    // synthetic frames: no fixture windows in the plan string
    val df = Knn.searchViaWindow(synthQueries(), synthVectors(), 5)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("topk_by_distance"), s"window not rewritten:\n$p")
    assert(!p.contains("row_number"), s"window survived the rewrite:\n$p")
    // and the rewrite preserves results exactly
    spark.conf.set("spark.graft.rewriteWindowTopK", "false")
    try {
      val naive = Knn.searchViaWindow(synthQueries(), synthVectors(), 5)
      val pn = naive.queryExecution.optimizedPlan.toString
      assert(pn.contains("row_number"), s"rule-off plan should keep the window:\n$pn")
      assert(df.orderBy("query_id", "rank").collect().toSeq ==
        naive.orderBy("query_id", "rank").collect().toSeq)
    } finally spark.conf.set("spark.graft.rewriteWindowTopK", "true")
  }

  test("the SQL-text API path gets the same rewrite: q224's row_number " +
      "window compiles to the bounded aggregate") {
    val df = SparkEntry.queries("q224_sql_api")(spark, sf0001)
    val p = df.queryExecution.optimizedPlan.toString
    assert(p.contains("topk_by_distance"), s"SQL window not rewritten:\n$p")
    assert(!p.contains("row_number"), s"window survived on the SQL path:\n$p")
  }

  test("window rewrite leaves non-matching windows alone") {
    import org.apache.spark.sql.expressions.Window
    val corpus = Tables.lineitemVec(spark, sf0001)
    // rank() (not row_number) must NOT be rewritten
    val w = Window.partitionBy(col("meta")).orderBy(col("id").cast("double"), col("id"))
    val df = corpus.withColumn("rnk", rank().over(w)).where(col("rnk") <= 3)
      .select(col("meta"), col("rnk"), col("id"))
    assert(df.queryExecution.optimizedPlan.toString.contains("rank("),
      "rank() window was wrongly rewritten")
    // a projection that needs a non-(key,rank,id,dist) column must survive
    val w2 = Window.partitionBy(col("meta")).orderBy(col("id").cast("double").as("d"), col("id"))
    val df2 = corpus
      .withColumn("d", col("id").cast("double"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("meta")).orderBy(col("d"), col("id"))))
      .where(col("rnk") <= 3)
      .select(col("meta"), col("rnk"), col("id"), col("vec")) // vec would be dropped
    assert(df2.queryExecution.optimizedPlan.toString.toLowerCase.contains("window"),
      "window with extra projected columns was wrongly rewritten")
    assert(df2.count() > 0)
  }

  test("scale-contract sweep: every query plan is CartesianProduct-free, " +
    "nested-loop joins only against documented broadcast-tiny sides, " +
    "no partition-less Window") {
    // the cheap regression net over ALL driver-contract queries: a refactor
    // that reintroduces an all-pairs join or a single-partition window fails
    // here before any benchmark notices
    val bnljOk = Set(
      "q12_delete_by_vector", // 5 target vectors, broadcast
      "q13_knn_window",       // the documented naive window baseline (|Q|=50 broadcast)
      "q16_kmeans_assign",    // 8 centers, broadcast
      "q42_pq_search",        // |Q|=50 queries, broadcast
      "q56_opq_adc",          // |Q|=50 queries, broadcast
      "q58_balanced_partition", // 8 centers, broadcast
      "q62_kmeans_heads",     // 8 centers, broadcast (fit + assign)
      "q64_pq_sdc",           // 20 quantized queries, broadcast
      "q76_boilerplate",      // ONE-row corpus-count scalar, broadcast
      "q91_ngram_lm",         // ONE-row vocabulary-size scalar, broadcast
      "q92_strip_boilerplate", // q76's one-row scalar inside the flag subplan
      "q98_curate_v2",        // q91's one-row scalar inside the LM-floor gate
      "q103_sq_codes",        // ONE-row (mns, mxs) stats arrays, broadcast
      "q104_tfidf",           // ONE-row corpus-count scalar, broadcast
      "q105_bm25",            // ONE-row (N, avgdl) corpus stats, broadcast
      "q107_mixture_weights", // ONE-row total + normalizer scalars, broadcast
      "q109_pagerank",        // ONE-row node-count scalar, broadcast
      "q110_passage_retrieval", // q105's ONE-row corpus stats over passages
      "q113_rebalance",       // ONE-row max-head-id offset scalar, broadcast
      "q114_maxsim",          // bounded query-bag vectors, broadcast
      "q116_sq_search",       // ONE-row (mns, mxs) stats arrays, broadcast
      "q117_graph_pagerank",  // ONE-row node-count scalar, broadcast
      "q118_binary_codes",    // ONE-row (n, sums) threshold stats, broadcast
      "q119_binary_search",   // same one-row stats + the ≤|Q|-row code batch
      "q121_importance_weights", // ONE-row (r_tot, t_tot) totals, broadcast
      "q122_phash_neardup",   // ONE-row (lc, hs) corpus-share stats, broadcast
      "q123_binary_recall",   // q119's plan inside the recall block
      "q127_rp_search",       // ≤|Q|-row projected-query batch, broadcast
      "q139_nb_classify",     // ONE-row doc-count scalar (priors), broadcast
      "q147_threshold_sweep", // score-resolution-bounded (<=10k-row) per-score
                              // frame: cumulative-count self-join + one-row
                              // totals, both broadcast
      "q148_label_agreement", // ONE-row (n, n_agree) × ONE-row margin-product
                              // scalars, broadcast
      "q149_cluster_drift",   // ONE-row (ta, tb) snapshot totals, broadcast
      "q159_quality_quantiles", // resolution-bounded per-value histogram
                                // self-join + one-row totals + pct literals,
                                // all broadcast
      "q161_auc",               // same resolution-bounded per-score frame
                                // self-join as q147, broadcast
      "q162_cluster_report",    // ≤|labels|²-pair centroid separation join
                                // over a broadcast-tiny centroid frame
      "q164_cluster_topics",    // ONE-row assigned-doc total, broadcast
      "q176_tpch_q22",          // ONE-row (Σbal, cnt) average scalar, broadcast
      "q180_psi",               // ONE-row (ta, tb) snapshot totals, broadcast
      "q188_skew_profile",      // ONE-row scan-total scalar, broadcast
      "q192_time_to_convert",   // resolution-bounded delay-histogram
                                // self-join + one-row total + pct literals,
                                // all broadcast (the q159 pattern)
      "q194_source_token_quantiles", // pct-literal broadcast over the
                                     // per-group histogram (q159 pattern)
      "q197_rvq_search",        // |Q|=50 query LUTs, broadcast (q42 shape)
      "q201_tpch_q15",          // ONE-row max-revenue scalar, broadcast
      "q205_collocations",      // ONE-row (N_uni, N_bi) totals, broadcast
      "q209_tpch_q11",          // ONE-row nation-total scalar, broadcast
      "q211_skyline",           // dominance pass over the LOCAL-SKYLINE
                                // candidate set (bounded by summed
                                // per-bucket skylines, not |input|),
                                // broadcast by construction
      "q212_basket_lift",       // ONE-row basket-total scalar, broadcast
      "q224_sql_api",           // |Q|=10 query rows, broadcast by SQL hint
                                // (the searchAggViaJoin shape from SQL text)
      "q225_funnel_summary",    // ONE-row stage-1 count scalar, broadcast
      "q229_vocab_coverage",    // ONE-row token-total scalar, broadcast
      "q235_decay_score",       // ONE-row max-ts as-of scalar, broadcast
      "q242_ab_test",           // two ONE-row variant frames, broadcast pair
      "q244_lsh_recall",        // three ONE-row count scalars, broadcast
      "q245_kmv_overlap",       // two ONE-row sketch frames, broadcast pair
      "q246_mixture_budget",    // q107's ONE-row mixture totals, broadcast
      "q250_freq_spectrum",     // ≤40-row octave-bounds range table, broadcast
      "q252_ivf_recall_curve",  // per-nprobe ONE-row (n_true × n_hit) scalars
      "q257_constraint_audit",  // ONE-row ref-check counts, broadcast pair
      "q258_chi2_assoc",        // post-aggregation margin grid (r×c categories)
                                // + ONE-row totals, broadcast
      "q259_cluster_purity",    // ONE-row count scalar inside the shared
                                // rank-1 assignment subplan
      "q260_cluster_nmi",       // ONE-row n + entropy scalars over the
                                // bounded contingency frame, broadcast
      "q263_hits",              // ONE-row node-count + per-round L1 totals
      "q264_jackknife",         // ONE-row (S, N) totals, broadcast
      "q265_kaplan_meier",      // resolution-bounded time-bucket histogram
                                // self-joins + ONE-row totals (q192 pattern)
      "q266_embargo_split",     // ONE-row shared-entity count, broadcast
      "q267_gini_tokens",       // value-histogram prefix self-join
                                // (q159 pattern), broadcast
      "q269_budget_allocate",   // per-round ONE-row pool scalar over the
                                // broadcast-tiny per-source frame
      "q272_wasserstein_drift", // merged-value histogram CDF/next self-joins
                                // + ONE-row totals (q159 pattern)
      "q275_benford",           // ONE-row digit-total scalar over the
                                // 9-row digit frame, broadcast
      "q278_ppr",               // ONE-row seed-count scalar, broadcast
                                // (the q109 pattern)
      "q281_ivf_autotune",      // per-config ONE-row count scalars + the
                                // ONE-row best-pick frame, broadcast
      "q282_lsh_autotune",      // same sweep-table shape over the banding
                                // harness
      "q286_ks_drift",          // merged-value histogram CDF self-joins +
                                // ONE-row totals (the q272 pattern)
      "q287_mutual_info",       // ONE-row total + entropy/MI scalars over
                                // the bounded contingency/margin frames
      "q288_quantile_norm",     // bounded (source, v) histogram CDF
                                // self-joins + ONE-row pooled total
      "q289_kneser_ney",        // ONE-row bigram-type total, broadcast
                                // (the q91 pattern)
      "q291_source_kl",         // vocabulary × broadcast-tiny source list
                                // dense grid + ONE-row totals
      "q294_kendall_tau",       // bounded dense-grid crossjoin + margin
                                // histogram self-join + ONE-row scalars
      "q295_winsorized",        // pct-literal broadcast over the per-source
                                // histogram (the q159 pattern)
      "q299_cuped",             // ONE-row pooled power-sum frame, broadcast
      "q301_word_vectors",      // ONE-row cooc total inside the PPMI chain,
                                // broadcast
      "q302_neyman_alloc",      // ONE-row weight-total + used scalars and
                                // the bounded per-stratum rank self-join
      "q303_isotonic",          // broadcast-literal PAV block range join
                                // over the bounded score histogram
      "q304_nelson_aalen",      // q265's bounded time-histogram ≤ self-join
      "q305_word_synonyms",     // ≤v-token vector-table self-pairing +
                                // the q301 chain's ONE-row cooc total
      "q313_heaps_law",         // ONE-row max-id scalar + the ≤32-row
                                // bucket-frame cumulative self-join
      "q314_fdr_drift")         // ≤|sources|-row BH rank/alarm self-joins
                                // (OR tie-break condition → BNLJ) + the
                                // ONE-row m scalar, all broadcast
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf0001)
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("CartesianProduct"),
        s"$name: CartesianProduct in plan — an O(n²) scale-killer:\n$phys")
      if (!bnljOk(name))
        assert(!phys.contains("BroadcastNestedLoopJoin"),
          s"$name: undocumented nested-loop join:\n$phys")
      val badWindows = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(badWindows.isEmpty,
        s"$name: Window without partitioning — single-partition shuffle")
      // the round-11 verdict's weak class: a window partitioned ONLY by
      // `source` over a raw-corpus frame sorts a whole domain — tens of TB —
      // in one task. Per-source windows are allowed only over histogram- /
      // aggregate-sized frames (an Aggregate is always beneath); raw-corpus
      // windows must carry a second partition key (bucket, shard, user…)
      import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
      val srcWindows = df.queryExecution.optimizedPlan.collect {
        case w: LWindow
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.flatMap(_.references.map(_.name.toLowerCase))
                .toSet == Set("source") &&
              w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(srcWindows.isEmpty,
        s"$name: Window.partitionBy(source) over a raw-corpus frame — " +
          "single-task-per-source sort at 100 TB")
    }
  }

  test("q85/q86: per-source windows only ever run over histogram-sized aggregates") {
    // the round-8 scale defect: Window.partitionBy(source) over the RAW
    // corpus puts a whole domain in one task. The rewritten operators may
    // only window per-source over the quality histogram (an Aggregate is
    // always beneath), or partition by (source, bucket)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    Seq("q85_quality_quantile", "q86_token_budget", "q136_quality_percentile").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf0001)
      val offending = df.queryExecution.optimizedPlan.collect {
        case w: LWindow
            if w.partitionSpec.length == 1 &&
              w.partitionSpec.head.references.map(_.name.toLowerCase).toSet == Set("source") &&
              w.child.collectFirst { case a: Aggregate => a }.isEmpty => w
      }
      assert(offending.isEmpty,
        s"$name: Window.partitionBy(source) over raw docs — single-task-per-source sort")
    }
  }

  test("q88 vocabulary top-V plans as a bounded TakeOrdered, not a global sort") {
    val df = SparkEntry.queries("q88_vocabulary")(spark, sf0001)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("TakeOrderedAndProject"),
      s"top-V should be TakeOrderedAndProject (per-partition heads + driver merge):\n$phys")
  }

  test("MaxDistRatio prune provably drops candidate heads (q63)") {
    import graft.operators.Spann
    val q = Tables.ordersQuery(spark, sf0001).where(col("query_id") < 50)
    val h = Spann.selectHeadsModulo(Tables.lineitemVec(spark, sf0001), 200)
    val all = Spann.candidateHeads(q, h, 8).count()
    val pruned = Spann.candidateHeads(q, h, 8, maxDistRatio = 2.0).count()
    assert(pruned > 0)
    assert(pruned < all, s"ratio=2.0 prune dropped nothing ($pruned of $all)")
  }

  test("whole-stage codegen covers the distance computation") {
    // q13 keeps the window formulation whose dist expression is a projected
    // column (q01's distance now lives inside the batch_topk aggregate)
    val df = SparkEntry.queries("q13_knn_window")(spark, sf0001)
    df.collect() // AQE finalizes the plan only on execution
    val p = df.queryExecution.executedPlan.toString
    // codegen'd stages render as "*(n) Operator" in the plan string; the
    // distance expression must sit inside one
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("dist_l2sq")),
      s"distance not inside a codegen span:\n$p")
    assert(!p.contains("BatchEvalPython"))
  }
}
