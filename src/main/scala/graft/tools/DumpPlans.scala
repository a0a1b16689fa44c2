package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.debug._

/** Regenerates PLANS.md: the formatted physical plans of the flagship
  * queries, with the scale rationale for each. Run after plan-shape changes:
  * `sbt "runMain graft.tools.DumpPlans"`.
  */
object DumpPlans {
  private val notes: Seq[(String, String)] = Seq(
    "q01_knn_l2" ->
      """Exact kNN as ONE corpus scan: all queries ride inside the
        |`batch_topk` ObjectHashAggregate (per-query bounded buffers update
        |map-side, merge at the final agg), so the exchange carries
        |O(|Q|·k·tasks) rows — never the |Q|×|N| fan-out a join or window
        |formulation shuffles. Scales with corpus partitions; queries are
        |broadcast-sized by contract.""".stripMargin,
    "q07_spann_postings" ->
      """SPANN posting build: heads ride inside the `nearest_heads`
        |expression (ratio-bounded set), so assignment is a map-only pass
        |over the corpus — no |N|×|H| crossjoin rows ever materialize; the
        |only wide op is the checkpoint that later queries share. At cluster
        |scale the same plan streams any corpus size through map tasks.""".stripMargin,
    "q08_spann_search" ->
      """Two-stage search: stage-1 candidates are map-side per query
        |(broadcast-bounded heads inside the expression), stage-2 joins the
        |tiny (query,head) set against postings on head_id, scores, and
        |dedups replicas INSIDE the bounded top-k aggregate (distinct-id
        |buffer — no extra near-unique-key shuffle). Against a saved index
        |the same join adds the head_bucket partition column and dynamic
        |partition pruning skips unprobed buckets.""".stripMargin,
    "q53_spann_hier" ->
      """Two-level routed search for head sets beyond a broadcast: only the
        |super-head set is broadcast; heads rank via an equi-join on
        |super_id; stage-2 unchanged. Every fan-out is bounded by
        |(superK, internalK, replicaCount) knobs — nothing scales with the
        |corpus except partitioned scans.""".stripMargin,
    "q311_spann_routed_postings" ->
      """Routed posting assignment for head sets beyond a broadcast: supers +
        |routing ride INSIDE the `routed_nearest_heads` expression, so the
        |two-level assignment is a map-only pass over the corpus — per vector
        |it scans the superK nearest supers' routed blocks only, and the only
        |rows that ever exist are the O(n·replicas) results (the join
        |formulation materializes one row per (vector, routed head) pair; the
        |10× probe measured that at ~1 GB shuffle and 16× the wall). Falls
        |back to the join form automatically past the expression's
        |driver-collect budget.""".stripMargin,
    "q33_dedup_minhash" ->
      """MinHash+LSH dedup with per-doc packed shingle sets: signatures are
        |in-row array_min (no groupBy), the Jaccard verify is in-row
        |array_intersect over candidate pairs (no per-shingle join); the only
        |shuffle is the LSH band-bucket self-join, which is candidate-sized,
        |not corpus-sized.""".stripMargin,
    "q44_tpch_q3" ->
      """Relational anchor: the selective dimension filter broadcasts, the
        |fact scan prunes to referenced columns with pushed filters, and the
        |aggregation is partial before the shuffle — stock Catalyst doing
        |what the declarative plan allows.""".stripMargin,
    "q79_kdtree_beam" ->
      """KD-tree beam search: the per-query frontier advances one level per
        |broadcast-join against the tiny split table (root applied as
        |literals — no constant-key join), each level's fork+prune is a
        |per-query window over ≤ 2·beam rows, and the final leaf probe is an
        |equi-join (partition-pruned via leaf_bucket on a stored tree). The
        |build behind it is one groupBy per level — every node's variance
        |stats in a single map-side-partial aggregation.""".stripMargin,
    "q82_dedup_incremental" ->
      """Incremental near-dup dedup: corpus band buckets join ONE-SIDED
        |against the batch's buckets (corpus×corpus pairs never form), hot
        |corpus buckets drop out via the windowed count guard, and the
        |batch's internal pairs reuse the guarded candidate join. Shuffle is
        |∝ batch + matched buckets — a daily-ingest probe against a 100 TB
        |corpus never re-pairs the corpus.""".stripMargin,
    "q84_dedup_index_probe" ->
      """The same probe against the PERSISTED band index: stored bands are
        |partitioned by band_bucket with membership counts precomputed, so
        |the plan carries a dynamicpruning subquery on the partition column
        |(only the buckets the batch touches are scanned) and the
        |stop-bucket guard is a pushed scan filter on `cnt` — build the
        |dedup index once, probe every ingest round.""".stripMargin,
    "q35_dedup_simhash" ->
      """64-bit SimHash, fully in-row: per-token hashes live in two array
        |columns and every bit's majority vote is a `filter` count over them
        |— one projection, no token explode, no per-doc groupBy; the only
        |post-scan work is the oracle's ORDER BY. Banding (simhashPairs)
        |joins on 16-bit band values with the MaxBandBucket stop-bucket
        |guard, so the candidate join is bucket-bounded like MinHash-LSH.""".stripMargin,
    "q85_quality_quantile" ->
      """Per-source quality floor WITHOUT a per-source window over the
        |corpus: a map-side-partial groupBy builds the (source, quality)
        |histogram — bounded by distinct 4-dp scores, not corpus size — the
        |percentile threshold derives from histogram-sized windows, and the
        |corpus is filtered through a broadcast threshold join at scan
        |speed. No task ever holds a whole source.""".stripMargin,
    "q86_token_budget" ->
      """Token-budget greedy as a two-level prefix sum: the quality
        |histogram assigns rank-balanced buckets (broadcast back), the
        |running sum windows over (source, bucket) — buckets× the
        |parallelism of a per-source window — and bucket offsets come from
        |a histogram-sized cumsum, broadcast-joined. The exact greedy
        |semantics of a total-order cumsum, with no single-task-per-source
        |sort anywhere.""".stripMargin,
    "q89_spann_filtered" ->
      """Filtered SPANN search: the metadata predicate becomes a pushed
        |filter on the corpus scan feeding an id semi-join applied to
        |stage-2 hits BEFORE distance scoring and the bounded top-k —
        |filtered-out entries pay no distance kernel, every top-k slot goes
        |to a passing vector, and stage-1 is untouched (reference
        |semantics: postings are built unfiltered).""".stripMargin,
    "q90_graph_search" ->
      """Graph-walk search (the reference's in-memory query loop as
        |level-synchronous beam rounds): every per-round frame — frontier,
        |fresh candidates — is |queries|×beam and sits on the BROADCAST side
        |of its join; the corpus-sized edge and vector tables are only ever
        |probed by broadcast-hash joins and never shuffle. On the stored
        |(BktIndex) layout the expansion join also keys on the src_bucket
        |partition column → dynamic partition pruning per round. The final
        |top-k is the same bounded aggregate as q01.""".stripMargin,
    "q91_ngram_lm" ->
      """Corpus-trained bigram LM scoring: two word-count aggregations (the
        |natural LM-training shuffles, map-side partial) + two 1:1
        |count-hydration joins + a broadcast 1-row vocabulary size; per-term
        |log-probs round to 6dp and sum as DECIMAL so the per-doc mean is
        |order-independent. No pair space, no window — scoring runs at
        |aggregation speed on any corpus.""".stripMargin,
    "q93_bpe_merges" ->
      """BPE tokenizer training: each round is ONE adjacent-pair count
        |aggregation whose shuffle is ∝ the vocabulary (distinct words, not
        |corpus tokens), a bounded 1-row top-pair collect, and an in-row
        |left-fold merge apply — no per-symbol rows, no window. Rounds are
        |few and fixed; the corpus-sized token explode happens once, at
        |vocabulary construction.""".stripMargin,
    "q105_bm25" ->
      """BM25 ranked retrieval: the exploded token stream is filtered to the
        |literal query terms at scan speed BEFORE any shuffle, so the only
        |corpus-sized exchange is the per-(doc, term) tf aggregation over
        |matching tokens; df and (N, avgdl) are broadcast one-row/tiny
        |aggregates; per-term partials sum as DECIMAL (order-independent)
        |and the finish is a bounded TakeOrderedAndProject — no global
        |window, no full sort.""".stripMargin,
    "q109_pagerank" ->
      """Integer-exact PageRank, 3 rounds: each round is one hash join of
        |the edge table against the rank frame (both partitioned on the join
        |key) + one map-side-partial BIGINT sum + a broadcast 1-row node
        |count for the teleport term — the canonical iterative-dataflow
        |plan; frame size stays |V|, nothing is windowed, nothing driver-
        |side. Floor-division damping keeps every value an exact BIGINT so
        |the plan is oracle-replayable.""".stripMargin,
    "q113_rebalance" ->
      """SPFresh-style posting rebalance: lengths and split pivots are
        |per-head aggregations (posting-bounded groups, in-plan max_by — no
        |collects); the split/keep/re-assign branches are hash joins on
        |head_id; orphan re-assignment probes the broadcast-bounded
        |survivor heads inside an expression; the finish dedups on
        |(head_id, id). No pair space, no corpus-wide window — the whole
        |maintenance round is scan + keyed joins + bounded groups.""".stripMargin,
    "q119_binary_search" ->
      """Binary coarse-to-fine: the corpus streams its 8-byte sign codes
        |through a bounded Hamming top-R aggregate (query codes ride the
        |broadcast side; per-task fan-out is 16-byte rows, the code scan
        |runs at memory bandwidth), then the ≤|Q|·R candidate set semi-joins
        |the float vectors for the exact re-rank — the full-width column is
        |touched for R rows per query, not the corpus. The threshold stats
        |are a ONE-row broadcast from a per-dim integer aggregation.""".stripMargin,
    "q120_semantic_dedup" ->
      """SemDeDup: nearest-centroid assignment is the q07 map-only
        |expression pass; the candidate pair join keys on head_id, so the
        |pair space is Σ|cluster|² — governed by the centroid count, which
        |scales with the corpus — and the exact cosine verify runs only
        |inside clusters. No all-pairs join exists in the plan.""".stripMargin,
    "q121_importance_weights" ->
      """DSIR importance weights: per-row tokenize+hash at scan speed, two
        |bucket-keyed aggregations bounded by the 256-bucket feature space,
        |a broadcast ≤256-row weight join, and one doc-keyed aggregation
        |with 6dp-rounded DECIMAL-summed terms. The q125 twin collapses the
        |scoring side to a pure in-row fold over a collected lookup array —
        |zero shuffle, stream-safe.""".stripMargin,
    "q124_mmr_rerank" ->
      """MMR diversified re-rank: the relevance pool (≤|Q|·R rows) and its
        |pairwise sim frame (≤|Q|·R²) are checkpointed once; each greedy
        |round is an anti-join + max-aggregation + per-query argmax over
        |those bounded frames. The corpus is touched exactly once — by the
        |q01-style bounded top-R scan that builds the pool.""".stripMargin,
    "q127_rp_search" ->
      """JL-sketch coarse-to-fine: the 16-integer projection is a per-row
        |codegen projection (nothing shuffles); the coarse pass streams the
        |sketch column through the bounded top-R aggregate with
        |integer-exact L2 (all magnitudes inside 2⁵³); the exact re-rank
        |touches original vectors for R rows per query — the q119 plan with
        |a distance-faithful sketch.""".stripMargin,
    "q128_chunk_dedup" ->
      """Chunk-level dedup: chunks explode in-row from the token array, the
        |canonicalization groups on an 8-byte chunk-text hash (never the
        |paragraph string), and the hydration join is 1:N on that same
        |hash — shuffle ∝ chunk count with narrow keys, no pair space.""".stripMargin,
    "q134_asof_attribution" ->
      """As-of join: both sides tag, union, and sort ONCE per key — a single
        |window on the high-cardinality user key carries the last right
        |payload forward (ignore-nulls last). The naive l.ts >= r.ts join
        |Spark would otherwise plan is a per-key cartesian; here shuffle is
        |∝ rows and each task holds one key-range's timeline.""".stripMargin,
    "q136_quality_percentile" ->
      """Percentile normalization without a corpus window: the per-source
        |histogram (bounded by distinct 4dp scores) computes percent_rank
        |arithmetic over histogram rows, broadcast back as a threshold map —
        |the q85 shape. The per-source windows in this plan only ever see
        |aggregate-sized frames (PlanSpec asserts it).""".stripMargin,
    "q138_assemble_training" ->
      """Training-set assembly as ONE plan: every gate is a semi-join onto
        |the single document scan (rule flags, importance floor, dedup
        |canon), chunking explodes in-row, and the shard layout windows over
        |the 16 shard partitions. The only materialization between stages is
        |the ≤256-row collected importance weight table.""".stripMargin,
    "q143_heavy_hitters" ->
      """Heavy hitters with NO vocabulary-sized state: pass 1 is one
        |misra_gries ObjectHashAggregate (≤ capacity counters per map task,
        |O(capacity·tasks) rows shuffled); pass 2 exact-counts ONLY the ≤
        |capacity candidates via a broadcast semi-filter — the token groupBy
        |a naive plan runs over every distinct token never appears. The
        |unbounded-key-space frequency shape (URLs, n-grams, user ids).""".stripMargin,
    "q150_farthest_points" ->
      """Greedy k-center: each of the k rounds is ONE corpus scan — the
        |selected centers ride as broadcast literals inside an in-row
        |array_min, and the argmax is TakeOrderedAndProject (per-partition
        |top-1 + driver merge of `tasks` rows, never a global sort). Driver
        |state per round: one collected row, the Lloyd contract.""".stripMargin,
    "q153_triangle_count" ->
      """Triangle census: after symmetrize/dedup, edges orient low-(deg,id)
        |→ high, so the wedge self-join enumerates at most O(√m) pairs per
        |node — O(m^{3/2}) total however hubby the graph — and closes with a
        |left-semi hash join. All shuffles key on node ids; no windows, no
        |pair space beyond the oriented wedges.""".stripMargin,
    "q160_salted_join" ->
      """Salted skew join: the fact side's key gains a deterministic
        |hash-salt projection (scan-speed), the dim side explodes salts×
        |in-row, and the equi-join runs on (key, salt) — a hot orderkey's
        |rows spread across salts reducers instead of serializing on one.
        |Result ≡ the plain join; the oracle IS the plain join.""".stripMargin,
    "q165_bloom_join" ->
      """Bloom-prefiltered semi-join: the distinct key set ORs into a 16 KiB
        |word array (distributed bit_or, word-keyed exchange of ≤ bits/64
        |rows), which probes as a LITERAL inside the fact scan's codegen
        |stage — most non-matching fact rows die before the semi-join's
        |exchange ever sees them. The exact semi-join after it removes the
        |false positives, so the result ≡ the plain semi-join. At 100 TB the
        |win is the fact-side shuffle volume; the filter is reusable across
        |facts probing the same key set.""".stripMargin,
    "q167_changelog" ->
      """Changelog (CDC) merge: snapshot ∪ changes through ONE
        |max_by(payload, (version, isDelete)) hash aggregation — map-side
        |partials mean the exchange carries one candidate per key per input
        |partition, and no task ever sorts a key-group (the window
        |formulation the oracle uses would). Same-version delete outranks
        |the upsert, so replays are idempotent.""".stripMargin,
    "q168_weighted_sample" ->
      """Weighted sampling (Efraimidis–Spirakis race): the per-row race key
        |is scan-speed column math; the global k smallest flow through the
        |bounded batch_topk aggregate — map-side partial top-k per task,
        |one ≤(k·tasks)-row merge — never a global sort. The oracle
        |sorts-and-limits; the engine must not.""".stripMargin,
    "q173_ppjoin" ->
      """Prefix-filtered exact Jaccard (PPJoin rule): candidates come only
        |from each doc's (1−τ)-fraction RAREST shingles (df-ascending
        |prefix), so hot boilerplate shingles never generate pairs and
        |recall is 100% by pigeonhole — the deterministic sibling of q33's
        |probabilistic MinHash banding. Per-doc rank windows partition on
        |doc_id (corpus-many keys); verify is the same in-row
        |array_intersect as q33.""".stripMargin,
    "q179_kcore" ->
      """k-core peel: level-synchronous rounds of degree-aggregate + two
        |semi-joins, checkpointed per round, stop at fixpoint or the round
        |cap. Each round's shuffle is O(edges); removal is simultaneous so
        |the result is order-independent — the classical parallel peel, the
        |same loop discipline as Lloyd/PageRank.""".stripMargin,
    "q188_skew_profile" ->
      """Join-key skew profile: per-key counts (map-side combined), then
        |the 20 hottest keys via the bounded top-k aggregate keyed on
        |(−cnt, key) — the profile that decides whether a join needs q160's
        |salting, computed without sorting the key histogram.""".stripMargin,
    "q95_hard_negatives" ->
      """Contrastive hard-negative mining as ONE label-aware corpus scan
        |(r10): every anchor rides inside the labeled_batch_topk
        |ObjectHashAggregate with its label; a corpus row updates only the
        |anchors whose label differs, partials merge map-side. Pre-r10 this
        |looped one batch_topk scan per label value — |labels| passes over
        |the corpus; the scan count is now 1 whatever the class count
        |(PlanSpec asserts it, and that q142's two-buffer sibling shares the
        |shape).""".stripMargin,
    "q197_rvq_search" ->
      """Two-level residual PQ (RVQ) search: the per-query (code1, code2)
        |LUT — m·k² doubles — builds once per query row and broadcasts with
        |the query batch; scoring is m flat lookups per (query, code-pair)
        |row and the bounded top-k aggregate merges map-side. Codebooks ride
        |as one broadcast, never a join; the quantized corpus is the only
        |scan-sized input.""".stripMargin,
    "q207_winnow_overlap" ->
      """MOSS-style overlap: per-doc winnowed fingerprints explode in-row,
        |a df > maxDf stop-fingerprint filter kills boilerplate BEFORE the
        |per-fingerprint self-join (the q33 band-bucket skew discipline), and
        |the pair aggregation keys on (a, b) with map-side combine. Report
        |threshold applies to the smaller side's fp count — in-row math on
        |the joined aggregate.""".stripMargin,
    "q211_skyline" ->
      """Skyline (Pareto front), distributive two-phase: a bucket-hashed
        |prefix-min window prunes locally (keeps a superset of each bucket's
        |skyline, provably every global-skyline row), then the bounded
        |candidate set anti-joins against its own BROADCAST copy on the
        |dominance predicate — the nested-loop is deliberate and safe
        |because the candidates are O(summed per-bucket skylines), never
        ||input|. No global sort, no |input|² pair space.""".stripMargin,
    "q214_scd2" ->
      """SCD2 validity intervals from a changelog: same-version ties settle
        |in ONE max_by hash aggregate (delete beats upsert, map-side
        |partial), then each key's version chain closes via lead() over a
        |per-key window — key cardinality = table size, so the window
        |exchange hash-spreads, never one partition. One aggregate + one
        |window, no per-version self-join.""".stripMargin,
    "q219_asof_nearest" ->
      """Nearest-direction as-of join: ONE tagged union, two ignore-nulls
        |carry windows (backward = last over preceding, forward = first
        |over following) sharing the per-key exchange, and two id-equi
        |joins to hydrate the winner — the per-key theta-join a naive
        |nearest-match would plan (cartesian per user) never appears.
        |Direction choice and the tolerance cut are in-row CASE math.""".stripMargin,
    "q220_interval_islands" ->
      """Interval islands: one per-key sort feeds both the running-max
        |island-break window and the running-sum island id, then one hash
        |aggregate closes each island. Shuffle ∝ rows on the
        |high-cardinality key; the interval SELF-join formulation (squares
        |on hot keys) never forms.""".stripMargin,
    "q224_sql_api" ->
      """The SQL-text API path: dist_l2sq is the registered codegen
        |Expression, and the query's naive row_number-window top-k is
        |rewritten by the injected WindowTopKRewrite rule into the bounded
        |topk_by_distance aggregate — map-side partials instead of
        |shuffling every (query, candidate) row to rank it. Same plan a
        |DataFrame formulation gets, from plain SQL.""".stripMargin,
    "q216_grouping_sets" ->
      """GROUPING SETS over an arbitrary (non-rollup-chain) set list: Spark
        |plans ONE scan + Expand (one row per matching set per input row) +
        |a single hash aggregate — never one scan per set unioned. The
        |decimal sums partial-aggregate map-side before the grouping-key
        |exchange.""".stripMargin,
    "q227_dedup_keep_best" ->
      """Keep-best dedup policy: winner selection is ONE hash aggregation
        |over canon_id (lexicographic struct-max on (quality, -id) — no
        |window, no per-group sort), then a left-semi hash join streams the
        |corpus once. The quality score is in-row column math computed
        |during the same scan that feeds the join.""".stripMargin,
    "q229_vocab_coverage" ->
      """OOV/coverage curve: token counts are ONE map-side-partial hash
        |aggregate (shuffle ∝ vocabulary, checkpointed once for all
        |cutoffs); each cutoff plans a bounded TakeOrderedAndProject over
        |the vocab frame — the global ORDER BY a naive rank formulation
        |would shuffle never appears; the one-row total broadcasts.""".stripMargin,
    "q233_profile" ->
      """Column profiler: per column ONE value-keyed hash aggregate
        |(map-side partial, shuffle ∝ distinct values) feeding a one-row
        |reduce that carries min/max/mode via struct-min — three tiny
        |frames unioned, no windows, no sorts, no second corpus scan per
        |statistic.""".stripMargin,
    "q246_mixture_budget" ->
      """Mixture-budgeted selection, ONE plan: the sources-sized tempered
        |weight frame broadcasts per-source budgets onto the q86 two-level
        |prefix sum (per-(source, bucket) windows + a histogram-sized
        |offset frame) — no per-source total-order window over raw docs,
        |no materialization between the mixture and selection stages.""".stripMargin,
    "q254_mutual_knn" ->
      """Mutual-kNN pairs: the 5-NN digraph builds as ONE batch_topk corpus
        |scan (the q01 aggregate), then reciprocity is a single left-semi
        |hash join of the O(n·k) edge list against its own reversal — edge
        |keys only, no vectors, no windows past the bounded per-query rank
        |cut.""".stripMargin,
    "q255_silhouette" ->
      """Centroid silhouette: ranks 1–2 per vector come from the SAME
        |single-scan bounded top-k aggregate kNN uses (heads ride inside
        |the expression); a/b/s are in-row projections and the per-centroid
        |mean is one hash aggregate over an exact DECIMAL sum — no |V|×|H|
        |join materialization, no windows, reduction-order-free.""".stripMargin,
    "q256_label_prop" ->
      """Label propagation: per round ONE hash join of the edge list
        |against the |V|-row label frame + a (dst, label)-keyed partial
        |aggregate; the majority pick windows only the aggregated node ×
        |live-label frame (bounded by the label vocabulary). Seeds clamp
        |via broadcast left joins; nothing driver-side, frame size |V|
        |throughout — the pageRank iterative-dataflow contract.""".stripMargin,
    "q257_constraint_audit" ->
      """Data-contract audit: all scan-family expectations (nulls, key
        |uniqueness, ranges, enumerated domains) fold into ONE conditional
        |aggregate over a single fact-table pass — adding a check adds a
        |column, not a scan; each referential check is one broadcast ANTI
        |join counted. Output is rows-per-check via inline(), driver-free.""".stripMargin,
    "q261_coverage_select" ->
      """Greedy set-cover selection: per round one ANTI join of the
        |doc-token incidence list against the covered set, one hash agg to
        |per-doc gains, and a global top-1 (TakeOrderedAndProject — no full
        |sort). The covered set is localCheckpointed so plans stay flat;
        |the only driver materialization is the single winning row per
        |round — greedy is sequential across ROUNDS, never across docs.""".stripMargin,
    "q262_pref_pairs" ->
      """Preference-pair assembly: the per-group best and worst lists are
        |each ONE bounded top-k aggregate pass (map-side reduced — at most
        |`pairs` rows per group reach the shuffle), never a per-source
        |window over the raw corpus; the pairing join runs on the
        |post-aggregation frame.""".stripMargin,
    "q263_hits" ->
      """HITS centrality: each half-round is a keyed hash-agg join over the
        |edge list (shuffle ∝ |E|) plus a one-row broadcast total for the
        |integer L1 renorm; ranks localCheckpoint per round. Exact BIGINT
        |arithmetic end-to-end — the pageRank fixed-point contract.""".stripMargin,
    "q265_kaplan_meier" ->
      """Kaplan-Meier survival: two keyed aggs build per-user durations, ONE
        |hash agg collapses them to the resolution-bounded time-bucket
        |histogram, and the at-risk / product-limit prefixes are self-joins
        |on that bounded frame (log-space DECIMAL folds). Censoring adds a
        |coalesce, not a scan.""".stripMargin,
    "q272_wasserstein_drift" ->
      """1-Wasserstein drift: per side one hash agg to value histograms;
        |CDFs, the next-value step, and the |F_a−F_b|·Δv fold are
        |self-joins on the bounded merged-value frame — no global sort.
        |W1 integrates HOW FAR mass moved; PSI's bins cannot.""".stripMargin,
    "q277_cusum" ->
      """CUSUM drift alarms: the sequential max(0,·) recurrence is computed
        |closed form (prefix sums minus prefix minima) on the bounded
        |type×day histogram — all-integer self-joins, no driver loop, so a
        |century of days costs two tiny joins.""".stripMargin)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/root/repo/PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4194304")
      // mirror Verify/Bench: constraint propagation is off in the gate
      // sessions (see Bench.scala), so dump the plans those sessions run
      .config("spark.sql.constraintPropagation.enabled", "false")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append("# PLANS — flagship physical plans (generated by `graft.tools.DumpPlans`)\n\n")
    sb.append(s"Source fixture: `$sfDir`. Regenerate after plan-shape changes.\n")
    for ((name, note) <- notes) {
      println(s"[plans] dumping $name")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.count() // let AQE finalize the executed plan
      sb.append(s"\n## $name\n\n")
      sb.append(note.linesIterator.map(_.trim).mkString(" ")).append("\n\n")
      sb.append("```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).trim)
      sb.append("\n```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
