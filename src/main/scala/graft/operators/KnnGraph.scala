package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{dist, Hash60, RngPrune, TopKByDistance}

/** k-NN-graph construction (B2/B3/B4,
  * `Common/NeighborhoodGraph.h:301-360` BuildInitKNNGraph + `:460-532`
  * RefineGraph + `RelativeNeighborhoodGraph.h:18-35`).
  *
  * The reference builds the initial graph with `TPTNumber` random-projection
  * trees: partition to ≤`TPTLeafSize` leaves, brute-force all pairs within a
  * leaf, keep the best neighbors per node, union across trees. The
  * Spark-native translation keeps that exact dataflow — partition, self-join
  * within partition, bounded top-k, union — but derives the leaf from
  * deterministic md5-seeded hyperplane codes instead of random median splits,
  * so the whole build is reproducible (and oracle-checkable) while keeping
  * the same locality property (nearby vectors co-bucket with high
  * probability; multiple trees = multiple independent plane sets).
  *
  * Scale: each tree's self-join is bucketed — shuffle ∝ corpus size; pair
  * work ∝ Σ bucket², bounded by the plane count (2^planes buckets).
  */
object KnnGraph {

  /** Integer hyperplane weight for (tree, plane, dim) — md5-seeded, engine
    * independent (mirrors `Hash60.sql("t||'_'||p||'_'||d") % 2001 - 1000`).
    */
  def planeWeight(tree: Int, plane: Int, d: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${tree}_${plane}_$d".getBytes("UTF-8"))
    java.lang.Long.parseLong(md.map("%02x".format(_)).mkString.take(15), 16) % 2001 - 1000
  }

  /** Per-tree leaf code: sign bits of `planes` integer-exact projections of
    * the (×1000, rounded) quantized vector.
    */
  def leafCode(vec: Column, tree: Int, planes: Int, dims: Int): Column = {
    val q = transform(vec, v => round(v.cast("double") * 1000).cast("long"))
    (0 until planes).map { p =>
      val dot = (0 until dims).map(d =>
        element_at(q, d + 1) * lit(planeWeight(tree, p, d))).reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Initial kNN graph: `(src, rank, dst, dist)`, ≤ neighborhoodSize edges
    * per node, ascending (dist, dst); self-edges excluded.
    */
  def build(
      vectors: DataFrame, // (id, vec)
      dims: Int,
      neighborhoodSize: Int,
      trees: Int = 2,
      planes: Int = 8,
      metric: String = "l2sq"): DataFrame = {
    val perTree = (0 until trees).map { t =>
      vectors.select(col("id"), col("vec"),
        leafCode(col("vec"), t, planes, dims).as("leaf"))
    }
    val shufflePartitions = vectors.sparkSession.sessionState.conf.numShufflePartitions
    val pairs = perTree.map { leaves =>
      // round-robin respread of the PROBE side (r16, guide §2.5): the leaf
      // join broadcasts the corpus side and streams this one, so probe-task
      // balance is whatever partitioning the source arrived with — and a
      // caller's src-range filter (q117's `src <= 2000`) pushes below the
      // join into an id-contiguous fixture layout, leaving every surviving
      // probe row in 1-2 partitions and the whole Σ|leaf|² pair compute on
      // as many cores (measured: stage wall 3.3 s vs runSum 9 s). The
      // filter still pushes below this exchange; the exchange carries only
      // the (already filtered) probe rows. Pair set and distances unchanged.
      val l = leaves.select(col("leaf"), col("id").as("src"), col("vec").as("svec"))
        .repartition(shufflePartitions)
      val r = leaves.select(col("leaf"), col("id").as("dst"), col("vec").as("dvec"))
      l.join(r, Seq("leaf"))
        .where(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          dist.byName(metric)(col("svec"), col("dvec")).as("d"))
    }.reduce(_ unionByName _)
    // a pair may surface from several trees (identical dist both times —
    // same vectors); dedup INSIDE the bounded distinct-id top-k instead of
    // a distinct() first: distinct shuffles the whole leaf-pair stream on
    // (src, dst, d) and then the groupBy shuffles it again, where the
    // aggregate's map-side partials reduce each task to ≤ neighborhoodSize
    // rows per src before the ONE exchange — at corpus scale the pair
    // stream is the dominant intermediate (measured: q17 dump 24 s → 9 s at
    // sf0.01, identical output)
    Knn.explodeRanked(
      pairs.groupBy(col("src").as("query_id"))
        .agg(TopKByDistance.topkDistinct(col("dst"), col("d"), neighborhoodSize).as("nn")))
      .withColumnsRenamed(Map("query_id" -> "src", "id" -> "dst"))
  }

  /** RNG refine (B3): prune each node's neighbor list with the relative
    * neighborhood rule (an accepted closer neighbor that is closer to the
    * candidate than the node itself makes the candidate redundant).
    * edges `(src, dst, dist)` + vectors → `(src, dst)` accepted, in
    * acceptance order.
    */
  def rngRefine(
      edges: DataFrame,
      vectors: DataFrame,
      rngFactor: Double = 1.0,
      maxNeighbors: Int = 32): DataFrame = {
    val withVec = edges
      .join(vectors.select(col("id").as("dst"), col("vec").as("dvec")), Seq("dst"))
    val cands = withVec
      .groupBy(col("src"))
      .agg(sort_array(collect_list(struct(
        col("dist").cast("double").as("dist"),
        col("dst").as("cid"), col("dvec").as("cvec")))).as("cands"))
    cands
      .withColumn("accepted", RngPrune(col("cands"), rngFactor, maxNeighbors))
      .select(col("src"), posexplode(col("accepted")).as(Seq("pos", "dst")))
      .select(col("src"), (col("pos") + 1).cast("int").as("rank"), col("dst"))
  }

  /** Graph-walk search (the reference's core in-memory query loop,
    * `BKT/BKTIndex.cpp:149-207`: tree-descent seeds feed a best-first
    * priority queue over the neighborhood graph, expansion budgeted by
    * `MaxCheck`).
    *
    * Spark-native re-expression: the sequential one-node-at-a-time queue
    * becomes LEVEL-SYNCHRONOUS beam expansion — each round pops the `beam`
    * best unexpanded candidates per query AT ONCE and expands all their
    * graph edges in one join, for a fixed number of rounds. The check
    * budget analogue is `seeds + rounds × beam × degree`; determinism comes
    * from (dist, id) ordering at every cut, so the whole walk is
    * oracle-checkable round-for-round.
    *
    * Seeding mirrors `m_iNumberOfInitialDynamicPivots`: a deterministic
    * pivot subset (`id % pivotNth = 0`) is ranked exactly and the best
    * `seeds` start the walk (the tree-descent path is exercised separately
    * by q09/q78-q80; any seed frame of shape `(query_id, id, dist)` can be
    * passed via `seedFrame`).
    *
    * Scale posture: every per-round frame (frontier, fresh candidates) is
    * ∝ |queries| × beam — the BROADCAST side of each join; the corpus-sized
    * tables (edges, vectors) are only ever probed by broadcast-hash joins
    * and never shuffle. Rounds are few and fixed. On a stored graph the
    * edges table would be bucketed by `src` for partition pruning, exactly
    * like the stored-posting layout (`IndexStore`).
    */
  def searchGraph(
      queries: DataFrame, // (query_id, qvec)
      vectors: DataFrame, // (id, vec)
      edges: DataFrame, // (src, dst) — ≤degree neighbors per src
      k: Int,
      pivotNth: Int = 100,
      seeds: Int = 4,
      beam: Int = 8,
      rounds: Int = 3,
      metric: String = "l2sq",
      seedFrame: Option[DataFrame] = None,
      /** Set on a stored graph ([[graft.BktIndex]]): edges carry a
        * `src_bucket = src % srcBuckets` partition column and each round's
        * expansion join keys on it too, so Catalyst dynamic-partition-prunes
        * the edge scan to the frontier's buckets — the same loaded-index DPP
        * path as the stored SPANN/KDT/dedup layouts.
        */
      srcBuckets: Option[Int] = None,
      /** Filtered search (`BKTIndex.cpp:623-647` CheckFilter semantics):
        * non-passing nodes still CONDUCT the walk — they seed, score, and
        * expand — but are dropped before the final top-k, so every result
        * slot goes to a passing id. `(id)` frame, semi-joined.
        */
      emitFilter: Option[DataFrame] = None): DataFrame = {
    val seeded = seedFrame.getOrElse {
      val pivots = vectors.where(col("id") % pivotNth === 0)
      Knn.searchAgg(queries, pivots, seeds, metric)
        .select(col("query_id"), explode(col("nn")).as("r"))
        .select(col("query_id"), col("r.id").as("id"),
          col("r.dist").cast("double").as("dist"))
    }
    // eager localCheckpoint per round: the loop frames are tiny
    // (|queries|×beam-ish) but their lineage would otherwise double each
    // round (same pattern as Dedup.canonicalGroups)
    var visited = seeded.localCheckpoint(true)
    var frontier = visited
    for (_ <- 1 to rounds) {
      val cand = expandCandidates(frontier, edges, srcBuckets)
      val fresh = cand
        .join(visited.select(col("query_id"), col("id")),
          Seq("query_id", "id"), "left_anti")
      val scored = broadcast(fresh)
        .join(vectors.select(col("id"), col("vec")), Seq("id"))
        .join(broadcast(queries), Seq("query_id"))
        .select(col("query_id"), col("id"),
          dist.byName(metric)(col("qvec"), col("vec")).cast("double").as("dist"))
        .localCheckpoint(true)
      visited = visited.unionByName(scored).localCheckpoint(true)
      frontier = scored
        .groupBy(col("query_id"))
        .agg(TopKByDistance.topk(col("id"), col("dist"), beam).as("nn"))
        .select(col("query_id"), explode(col("nn")).as("r"))
        .select(col("query_id"), col("r.id").as("id"),
          col("r.dist").cast("double").as("dist"))
    }
    val emitted = emitFilter match {
      case Some(ids) =>
        visited.join(ids.select(col("id")), Seq("id"), "left_semi")
      case None => visited
    }
    Knn.explodeRanked(
      emitted.groupBy(col("query_id"))
        .agg(TopKByDistance.topk(col("id"), col("dist"), k).as("nn")))
  }

  /** One expansion round of [[searchGraph]]: frontier `(query_id, id)` ×
    * edges → distinct `(query_id, id)` neighbor candidates. With
    * `srcBuckets` the join keys on the stored `src_bucket` partition column
    * too — the broadcast frontier then dynamic-partition-prunes the edge
    * scan (spec-asserted on the [[graft.BktIndex]] stored layout).
    */
  private[graft] def expandCandidates(
      frontier: DataFrame,
      edges: DataFrame,
      srcBuckets: Option[Int]): DataFrame = {
    val probe = frontier.select(col("query_id"), col("id").as("src"))
    val (keyed, edgeSel, joinKeys) = srcBuckets match {
      case Some(b) => (
        // the between() is semantically a no-op (pmod lands in [0, b)) but
        // gives the optimizer the selective predicate DPP insertion requires
        // — without it the bucketed scan reads every partition
        probe.withColumn("src_bucket", pmod(col("src"), lit(b)).cast("int"))
          .where(col("src_bucket").between(0, b - 1)),
        edges.select(col("src_bucket"), col("src"), col("dst")),
        Seq("src_bucket", "src"))
      case None =>
        (probe, edges.select(col("src"), col("dst")), Seq("src"))
    }
    broadcast(keyed)
      .join(edgeSel, joinKeys)
      .select(col("query_id"), col("dst").as("id"))
      .distinct()
  }

  /** In-degree-balanced rebuild (B4, `NeighborhoodGraph.h:404-458`): halve
    * each node's neighbor list, keeping low-in-degree targets first.
    */
  def rebuildBalanced(edges: DataFrame, neighborhoodSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val inDeg = edges.groupBy(col("dst")).agg(count(lit(1)).as("in_deg"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("in_deg"), col("dist"), col("dst"))
    edges.join(inDeg, Seq("dst"))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= neighborhoodSize / 2)
      .select(col("src"), col("dst"), col("dist"))
  }

  /** PageRank over a k-regular kNN graph — graph centrality as a
    * data-selection signal (central = representative, peripheral = outlier;
    * the graph-based counterpart of the quality scores in
    * [[TextAnalysis]]). `edges(src, dst)` with out-degree-`k` regularity
    * (every kNN graph is, by construction); pass `k <= 0` for irregular
    * graphs — e.g. the RNG-pruned [[rngRefine]] output, whose prune leaves
    * variable degree — at the cost of one out-degree aggregation.
    * `nodes(id)` is the vertex set.
    *
    * Integer-exact fixed-point arithmetic so the oracle hashes bare BIGINTs:
    * ranks live in units of 1e-12 (`Scale`), the damping step is
    * `contrib = (pr · 85) div (100·k)` and the teleport term
    * `(15 · Scale) div (100 · N)` — `div` is integral division, exact and
    * identical in Spark and DuckDB for the non-negative values here, and the
    * incoming-edge sum is a BIGINT sum (order-independent). `iters` rounds,
    * sinks get teleport mass only (left join). Output `(id, pr)` in units.
    *
    * Scale shape per round: one hash join of edges against the rank frame
    * (both partitioned on the join key) + one map-side-partial groupBy —
    * the classic iterative-dataflow plan; no windows, nothing driver-side,
    * frame size = |V| throughout.
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, k: Int,
      iters: Int = 3, dampingPct: Int = 85): DataFrame = {
    val Scale = 1000000000000L
    // k > 0: the k-out-regular fast path (every kNN graph) — the damping
    // divisor is a literal, no degree computation. k <= 0: irregular graphs
    // (e.g. an RNG-pruned B3 graph, whose prune leaves variable degree) pay
    // one out-degree aggregation, joined alongside the ranks; same exact
    // integer arithmetic with the divisor per-source
    // r16 (per-iteration checkpoint cadence, the `hits` convention): the
    // unrolled recursion otherwise re-plans AND re-executes the whole
    // prefix each round — q117's 3-iteration plan was 147 nodes with the
    // nodes-distinct and degree-join subtrees (2 SortMergeJoins + ~6
    // Exchanges) repeated per iteration. Materializing the loop-invariant
    // frames once and the rank frame per round keeps every round's plan
    // flat and constant-size; the integer arithmetic — and so every rank —
    // is unchanged.
    val nodesCp = nodes.localCheckpoint(true)
    val n = nodesCp.agg(count(lit(1)).as("_n"))
    val degreed =
      if (k > 0) edges.withColumn("_deg", lit(k.toLong))
      else edges.join(
        edges.groupBy(col("src")).agg(count(lit(1)).as("_deg")), Seq("src"))
        .localCheckpoint(true)
    // teleport term and the initial uniform rank are per-row exact integer
    // expressions of the one-row count frame (broadcast), so nothing about
    // N is computed on the driver
    var pr = nodesCp.crossJoin(broadcast(n))
      .select(col("id"), expr(s"${Scale}L div _n").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = degreed
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          expr(s"(pr * $dampingPct) div (100 * _deg)").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_in"))
      pr = nodesCp.crossJoin(broadcast(n))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (expr(s"${(100L - dampingPct) * Scale}L div (100 * _n)") +
            coalesce(col("_in"), lit(0L))).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Personalized PageRank: [[pageRank]] with teleport restricted to a
    * SEED set — the graph-expansion selector for domain-targeted data
    * curation ("rank the whole corpus by closeness to these exemplar
    * docs", the random-walk complement of DSIR's importance weights).
    * Identical integer fixed-point arithmetic; mass starts uniform on
    * the seeds and the (100−damping)% teleport returns ONLY to seeds,
    * so non-seed nodes rank purely by inbound walk mass. Output
    * `(id, pr)` BIGINT.
    *
    * Scale shape: same as [[pageRank]] — per round one keyed agg join
    * over the edge list; the seed indicator rides a broadcast-joined
    * flag column; one one-row seed-count broadcast.
    */
  def personalizedPageRank(edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, k: Int, iters: Int = 3,
      dampingPct: Int = 85): DataFrame = {
    val Scale = 1000000000000L
    // teleport shares count only seeds that EXIST in `nodes`, each once —
    // raw seed frames may carry duplicates or ids outside the graph, and
    // counting those would silently leak teleport mass (an empty effective
    // seed set would make every `div _ns` a NULL that poisons all rounds)
    val effSeeds = seeds.select(col("id")).distinct()
      .join(nodes.select(col("id")), Seq("id"), "left_semi")
    val ns = effSeeds.agg(count(lit(1)).as("_ns"))
    require(!effSeeds.isEmpty,
      "personalizedPageRank needs at least one seed present in `nodes`")
    val flagged = nodes
      .join(effSeeds.select(col("id"), lit(1).as("_seed")), Seq("id"), "left")
      .localCheckpoint(eager = false)
    var pr = flagged.crossJoin(broadcast(ns))
      .select(col("id"),
        when(col("_seed").isNotNull, expr(s"${Scale}L div _ns"))
          .otherwise(lit(0L)).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("id", "src"), Seq("src"))
        .select(col("dst"),
          expr(s"(pr * $dampingPct) div ${100 * k}").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_in"))
      pr = flagged.crossJoin(broadcast(ns))
        .join(contrib.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (when(col("_seed").isNotNull,
            expr(s"${(100L - dampingPct) * Scale}L div (100 * _ns)"))
            .otherwise(lit(0L)) +
            coalesce(col("_in"), lit(0L))).as("pr"))
        // per-round checkpoint (the `hits`/pageRank cadence, r16): flat
        // constant-size round plans instead of an unrolled recursion
        .localCheckpoint(true)
    }
    pr
  }

  /** HITS hubs & authorities over a directed edge list (Kleinberg '99) —
    * the companion centrality to [[pageRank]] for kNN digraphs: a high
    * AUTHORITY is a vector many good hubs point at (a density peak /
    * canonical representative); a high HUB points at many good
    * authorities. Output `(id, hub, auth)` as integer fixed-point
    * (Scale=1e12-normalized L1 per round).
    *
    * Determinism contract: exact integer arithmetic end-to-end, exactly
    * like [[pageRank]] — each round is `auth = Σ_in hub`, then L1
    * renormalize via `(x · Scale) div Σx`, then `hub = Σ_out auth`,
    * renormalize — so every engine reproduces the same longs and the
    * oracle unrolls the rounds verbatim. Scale is 1e9 (not [[pageRank]]'s
    * 1e12): the renorm multiplies a rank bounded by Scale (a pre-renorm
    * rank never exceeds the previous round's total mass) by Scale again,
    * and 1e9 keeps that product at 1e18 — inside Long, where 1e12 would
    * overflow.
    *
    * Scale shape: per round, two keyed hash-agg joins over the edge list
    * (shuffle ∝ |E|) and two one-row broadcast totals; ranks
    * localCheckpoint per round so the plan stays flat. No windows, no
    * collects.
    */
  def hits(edges: DataFrame, nodes: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1, "hits needs at least one round")
    val Scale = 1000000000L
    val n = nodes.agg(count(lit(1)).as("_n"))
    def renorm(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(greatest(sum(col(c)), lit(1L)).as("_t"))
      df.crossJoin(broadcast(tot))
        .select(col("id"), expr(s"($c * ${Scale}L) div _t").as(c))
    }
    var hub = nodes.crossJoin(broadcast(n))
      .select(col("id"), expr(s"${Scale}L div _n").as("hub"))
    var auth: DataFrame = null // always assigned in round 1
    for (_ <- 1 to iters) {
      auth = renorm(
        nodes.join(
          edges.join(hub.withColumnRenamed("id", "src"), Seq("src"))
            .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
            .withColumnRenamed("dst", "id"),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("auth"), lit(0L)).as("auth")),
        "auth").localCheckpoint(eager = false)
      hub = renorm(
        nodes.join(
          edges.join(auth.withColumnRenamed("id", "dst"), Seq("dst"))
            .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
            .withColumnRenamed("src", "id"),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("hub"), lit(0L)).as("hub")),
        "hub").localCheckpoint(eager = false)
    }
    hub.join(auth, Seq("id"))
      .select(col("id"), col("hub"), col("auth"))
  }

  /** Neighborhood stability between two kNN edge snapshots — the
    * re-embedding / data-refresh health check: for every query node
    * present in BOTH snapshots, how many of its neighbors survived?
    * Output the overlap histogram `(n_common, n_nodes)` (0 ≤ n_common ≤
    * k; a spike at low overlap = the refresh rewired the space). Exact
    * integer counts — engine-trivial.
    *
    * Scale shape: both inputs are O(n·k) edge lists (bounded top-k
    * passes); the overlap is one equi-join on (src, dst) + two hash aggs.
    * Zero-overlap nodes are kept via the shared-src frame (semi-joins),
    * never a window.
    */
  def knnStability(edgesA: DataFrame, edgesB: DataFrame): DataFrame = {
    val a = edgesA.select(col("src"), col("dst"))
    val b = edgesB.select(col("src"), col("dst"))
    val shared = a.select(col("src")).distinct()
      .join(b.select(col("src")).distinct(), Seq("src"), "left_semi")
    val common = a.join(b, Seq("src", "dst"), "left_semi")
      .groupBy(col("src")).agg(count(lit(1)).as("_c"))
    shared.join(common, Seq("src"), "left")
      .select(coalesce(col("_c"), lit(0L)).as("n_common"))
      .groupBy(col("n_common")).agg(count(lit(1)).as("n_nodes"))
  }

  /** Per-node triangle counts + local clustering coefficient over a
    * directed edge list — the structural health metric of a kNN graph
    * (well-built neighborhoods close into triangles; a broken / random
    * graph does not). Output `(id, deg, n_triangles, clustering)` with
    * `clustering = 2T / (deg·(deg−1))` (6dp; 0.0 for deg ≤ 1), one row
    * per node of the symmetrized graph.
    *
    * Algorithm: the degree-oriented wedge join (Suri & Vassilvitskii,
    * WWW'11) — symmetrize and dedup edges, orient every edge from its
    * lower-(degree, id) endpoint to the higher, enumerate wedges only at
    * each edge's LOW endpoint, close them with a semi-join against the
    * oriented edges. Orientation caps every node's out-degree at
    * O(√m), so the wedge join is O(m^{3/2}) TOTAL — the bound that makes
    * triangle counting feasible at corpus scale — instead of
    * Σ deg² (quadratic at hubs). All joins key on node ids; no windows.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val wd = und
      .join(deg.select(col("id").as("a"), col("deg").as("_da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("deg").as("_db")), Seq("b"))
    val fwd = col("_da") < col("_db") ||
      (col("_da") === col("_db") && col("a") < col("b"))
    val o = wd.select(
      when(fwd, col("a")).otherwise(col("b")).as("u"),
      when(fwd, col("b")).otherwise(col("a")).as("v"),
      when(fwd, col("_db")).otherwise(col("_da")).as("_dv"))
    val wedges = o.select(col("u"), col("v").as("x"), col("_dv").as("_dx"))
      .join(o.select(col("u"), col("v").as("y"), col("_dv").as("_dy")), Seq("u"))
      .where(col("_dx") < col("_dy") ||
        (col("_dx") === col("_dy") && col("x") < col("y")))
    val tris = wedges
      .join(o.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"), "left_semi")
      .select(col("u"), col("x"), col("y"))
    val perNode = tris
      .select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("_t"))
    deg.join(perNode, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("_t"), lit(0L)).as("n_triangles"),
        when(col("deg") > 1,
          round(lit(2.0) * coalesce(col("_t"), lit(0L)) /
            (col("deg") * (col("deg") - 1)), 6))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** k-core decomposition (fixed k): iteratively peel nodes of undirected
    * degree < k until the graph stabilizes — the densest-region extractor of
    * a kNN-graph health audit (nodes OUTSIDE the k-core are the weakly
    * embedded points whose neighborhoods won't survive RNG pruning; the
    * core is where graph search actually flows). Returns the surviving
    * `(id, deg)` with degrees measured on the final edge set.
    *
    * Level-synchronous peel like [[KnnGraph.rebuild]]'s rounds: each round
    * is one degree aggregation + two semi-joins, checkpointed so lineage
    * stays flat; the loop stops at fixpoint or after `maxRounds` (both
    * bounded — one `count` action per round, the documented driver-action
    * contract of the Lloyd loop). A round removes every node below k
    * SIMULTANEOUSLY (the standard parallel peel), so the result is
    * order-independent and exactly the classical k-core at fixpoint.
    *
    * `maxRounds` is a runaway guard, not a truncation knob: with
    * `requireFixpoint` (the default) exhausting it before fixpoint
    * (possible on long path-like peel chains) throws rather than silently
    * returning a supergraph with sub-k degrees. The default of 64 rounds
    * covers any peel chain of depth ≤ 64 — far past kNN-graph shapes,
    * where peels converge in a handful of rounds. Pass
    * `requireFixpoint = false` ONLY when truncated semantics are the
    * contract (the oracle mirror unrolls exactly `maxRounds` rounds in
    * SQL, so both sides truncate identically).
    */
  /** Mutual (reciprocal) kNN pairs: `(a, b)` with `a < b` kept iff BOTH
    * directed edges a→b and b→a exist in the kNN digraph. The classic
    * high-precision near-duplicate / cluster-seed signal (a one-sided kNN
    * edge only says "b is among a's closest", which hubs satisfy for
    * everyone; mutuality kills hub false-positives) — the pair generator
    * RNN-clustering and two-way-match dedup start from.
    *
    * Scale: one self-equi-join of the edge list on (src, dst) — edges are
    * O(n·k), never the corpus pair space; no windows, no driver state.
    */
  def mutualKnn(edges: DataFrame): DataFrame = {
    val f = edges.select(col("src"), col("dst"))
    f.where(col("src") < col("dst"))
      .join(f.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .select(col("src").as("a"), col("dst").as("b"))
  }

  /** Semi-supervised label propagation over a kNN digraph (the standard
    * "spread the few gold labels along nearest-neighbor edges" labeler a
    * curation pipeline uses to cheaply extend a small labeled set): seeds
    * are CLAMPED; every other node adopts, each synchronous round, the
    * majority label among its in-neighbors' current labels (count DESC,
    * label ASC on ties — deterministic), staying unlabeled until a labeled
    * in-neighbor exists. Returns `(id, label)` for the labeled nodes after
    * `iters` rounds.
    *
    * Scale shape per round (the [[pageRank]] contract): one hash join of
    * edges against the |V|-row label frame + a (dst, label)-keyed count
    * aggregate; the majority pick windows only the aggregated
    * (node × live-label) frame — bounded by the label vocabulary, never
    * corpus rows.
    */
  def labelPropagate(edges: DataFrame, nodes: DataFrame, seeds: DataFrame,
      iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clamp = seeds.select(col("id"), col("label").as("_seed"))
    var cur = nodes.select(col("id"))
      .join(clamp, Seq("id"), "left")
      .select(col("id"), col("_seed").as("label"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(cur.select(col("id").as("src"), col("label")), Seq("src"))
        .where(col("label").isNotNull)
        .groupBy(col("dst"), col("label")).agg(count(lit(1)).as("_c"))
      val w = Window.partitionBy(col("dst"))
        .orderBy(col("_c").desc, col("label"))
      val pick = contrib
        .withColumn("_rn", row_number().over(w)).where(col("_rn") === 1)
        .select(col("dst").as("id"), col("label").as("_pick"))
      cur = nodes.select(col("id"))
        .join(clamp, Seq("id"), "left")
        .join(pick, Seq("id"), "left")
        .select(col("id"), coalesce(col("_seed"), col("_pick")).as("label"))
    }
    cur.where(col("label").isNotNull)
  }

  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 64,
      requireFixpoint: Boolean = true): DataFrame = {
    require(k >= 1 && maxRounds >= 1)
    def degrees(und: DataFrame): DataFrame =
      und.select(col("a").as("id"))
        .unionAll(und.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    var und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      val surv = degrees(und).where(col("deg") >= k).select(col("id"))
      val pruned = und
        .join(surv.select(col("id").as("a")), Seq("a"), "left_semi")
        .join(surv.select(col("id").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      stable = pruned.count() == und.count()
      und = pruned
      round += 1
    }
    if (!stable && requireFixpoint)
      throw new IllegalStateException(
        s"kCore: peel not at fixpoint after $maxRounds rounds — raise maxRounds")
    degrees(und)
  }
}
