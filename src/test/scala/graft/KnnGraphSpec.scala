package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, KnnGraph}

/** B2/B3/B4 graph construction (mirrors `NeighborhoodGraph.h` invariants). */
class KnnGraphSpec extends SparkSpec {

  private lazy val corpus = Tables.lineitemVec(spark, sf0001)
    .select(col("id"), col("vec")).cache()

  test("graph edges are sane: no self-edges, bounded degree, sorted ranks") {
    val g = KnnGraph.build(corpus, 6, 8, trees = 2).cache()
    assert(g.where(col("src") === col("dst")).count() === 0)
    assert(g.groupBy("src").count().agg(max("count")).head().getLong(0) <= 8)
    val perSrc = g.orderBy("src", "rank").collect().groupBy(_.getLong(0))
    perSrc.foreach { case (_, rows) =>
      val dists = rows.map(_.getDouble(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("graph recall: bucketed edges overlap true kNN substantially") {
    val g = KnnGraph.build(corpus, 6, 8, trees = 4)
    val queries = corpus.limit(100)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val truth = Knn.search(queries, corpus, 9)
      .where(col("id") =!= col("query_id")).where(col("rank") <= 9)
    val hits = g.select(col("src").as("query_id"), col("dst").as("id"))
      .join(truth.select("query_id", "id"), Seq("query_id", "id"), "left_semi")
    val totalTruth = truth.join(queries, Seq("query_id"), "left_semi").count()
    val found = hits.join(queries, Seq("query_id"), "left_semi").count()
    val recall = found.toDouble / totalTruth
    assert(recall >= 0.25, s"graph recall $recall") // multi-tree LSH buckets
  }

  test("more trees → graph recall never drops") {
    def recall(trees: Int): Double = {
      val g = KnnGraph.build(corpus, 6, 8, trees)
      val queries = corpus.limit(50)
        .select(col("id").as("query_id"), col("vec").as("qvec"))
      val truth = Knn.search(queries, corpus, 9)
        .where(col("id") =!= col("query_id"))
      val found = g.select(col("src").as("query_id"), col("dst").as("id"))
        .join(truth.select("query_id", "id"), Seq("query_id", "id"), "left_semi")
        .join(queries, Seq("query_id"), "left_semi").count()
      found.toDouble / truth.join(queries, Seq("query_id"), "left_semi").count()
    }
    assert(recall(4) >= recall(1) - 1e-9)
  }

  test("RNG refine keeps the closest neighbor and only prunes") {
    val g = KnnGraph.build(corpus, 6, 8, trees = 2)
    val refined = KnnGraph.rngRefine(g, corpus)
    // subset property
    assert(refined.select("src", "dst")
      .exceptAll(g.select("src", "dst")).count() === 0)
    // rank-1 edge (closest neighbor) always survives
    val closest = g.where(col("rank") === 1).select("src", "dst")
    assert(closest.exceptAll(refined.select("src", "dst")).count() === 0)
  }

  test("balanced rebuild halves degree preferring low in-degree targets") {
    val g = KnnGraph.build(corpus, 6, 8, trees = 2)
    val rebuilt = KnnGraph.rebuildBalanced(g, 8)
    assert(rebuilt.groupBy("src").count().agg(max("count")).head().getLong(0) <= 4)
  }

  // ---- graph-walk search (BKTIndex.cpp:149-207 analogue) ----

  private lazy val walkCorpus = corpus.where(col("id") <= 500).cache()
  private lazy val walkGraph =
    KnnGraph.build(walkCorpus, 6, 8, trees = 4).select("src", "dst").cache()
  private lazy val walkQueries = Tables.ordersQuery(spark, sf0001)
    .where(col("query_id") < 10)

  test("graph walk: exhaustive beam on a connected graph ≡ exact kNN") {
    // beam ≥ corpus and enough rounds → the walk visits every node reachable
    // from the seeds; on the SYMMETRIZED graph (directed kNN edges leave
    // low-in-degree islands) that is the whole corpus, so the result must be
    // IDENTICAL to brute-force kNN
    val sym = walkGraph.unionByName(
      walkGraph.select(col("dst").as("src"), col("src").as("dst"))).distinct()
    val walked = KnnGraph.searchGraph(walkQueries, walkCorpus, sym,
      k = 5, pivotNth = 50, seeds = 4, beam = 500, rounds = 12)
    val exact = Knn.search(walkQueries, walkCorpus, 5)
    assert(walked.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(walked).count() === 0)
  }

  test("graph walk: bounded-beam results are valid, deterministic, ranked") {
    val r1 = KnnGraph.searchGraph(walkQueries, walkCorpus, walkGraph,
      k = 5, pivotNth = 50, seeds = 3, beam = 6, rounds = 3).cache()
    // deterministic: a second identical walk returns the same rows
    val r2 = KnnGraph.searchGraph(walkQueries, walkCorpus, walkGraph,
      k = 5, pivotNth = 50, seeds = 3, beam = 6, rounds = 3)
    assert(r1.exceptAll(r2).count() === 0 && r2.exceptAll(r1).count() === 0)
    // shape: ids come from the corpus, ranks contiguous from 1, dist ascending
    assert(r1.join(walkCorpus, Seq("id"), "left_anti").count() === 0)
    r1.orderBy("query_id", "rank").collect().groupBy(_.getLong(0)).foreach {
      case (_, rows) =>
        assert(rows.map(_.getInt(1)).toSeq === (1 to rows.length))
        val dists = rows.map(_.getDouble(3))
        assert(dists.zip(dists.tail).forall { case (a, b) => a <= b })
    }
  }

  test("graph walk: wider beam or more rounds never hurts recall") {
    val exact = Knn.search(walkQueries, walkCorpus, 5)
    def recall(beam: Int, rounds: Int): Double = {
      val w = KnnGraph.searchGraph(walkQueries, walkCorpus, walkGraph,
        k = 5, pivotNth = 50, seeds = 3, beam = beam, rounds = rounds)
      w.select("query_id", "id")
        .join(exact.select("query_id", "id"), Seq("query_id", "id"), "left_semi")
        .count().toDouble / exact.count()
    }
    val narrow = recall(4, 2)
    val wide = recall(16, 4)
    assert(wide >= narrow - 1e-9, s"recall narrowed: $narrow -> $wide")
    assert(wide >= 0.5, s"wide-beam recall too low: $wide")
  }

  test("pageRank: integer mass conserved up to flooring, hubs outrank leaves") {
    import spark.implicits._
    // star-ish digraph on 6 nodes, out-degree 2: everyone cites 0 and 1,
    // node 0 cites 1,2 and node 1 cites 0,2
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 0L), (1L, 2L),
      (2L, 0L), (2L, 1L), (3L, 0L), (3L, 1L),
      (4L, 0L), (4L, 1L), (5L, 0L), (5L, 1L)).toDF("src", "dst")
    val nodes = (0L to 5L).toDF("id")
    val pr = KnnGraph.pageRank(edges, nodes, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = pr.values.sum
    // floor division leaks < 1 unit per term; 1e12-scale total survives
    assert(total > 990000000000L && total <= 1000000000000L, s"mass: $total")
    assert(pr(0L) > pr(2L) && pr(1L) > pr(2L), s"hubs lead: $pr")
    assert(pr(2L) > pr(3L), s"cited beats uncited: $pr")
    assert(pr(3L) === pr(4L) && pr(4L) === pr(5L), "symmetric leaves tie")
  }

  test("pageRank equals a plain-Scala reference on random out-regular digraphs") {
    import spark.implicits._
    val Scale = 1000000000000L
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val n = 6 + rng.nextInt(15)
      val k = 3
      val edgeSeq = (0L until n.toLong).flatMap { src =>
        rng.shuffle((0L until n.toLong).filter(_ != src).toList).take(k)
          .map(dst => (src, dst))
      }
      // reference: identical integer fixed-point arithmetic, plain Scala
      var ref = Array.fill(n)(Scale / n)
      val base = (15L * Scale) / (100L * n)
      for (_ <- 1 to 3) {
        val in = Array.fill(n)(0L)
        for ((s, d) <- edgeSeq) in(d.toInt) += ref(s.toInt) * 85L / (100L * k)
        ref = Array.tabulate(n)(i => base + in(i))
      }
      val got = KnnGraph.pageRank(
        edgeSeq.toDF("src", "dst"), (0L until n.toLong).toDF("id"), k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (i <- 0 until n)
        assert(got(i.toLong) === ref(i), s"node $i of n=$n")
    }
  }

  test("pageRank k<=0: degree-aware path equals fixed-k on regular graphs " +
    "and conserves mass on the RNG-pruned fixture graph") {
    import spark.implicits._
    // regular fixture: the earlier star-ish digraph, out-degree 2 everywhere
    val edges = Seq(
      (0L, 1L), (0L, 2L), (1L, 0L), (1L, 2L),
      (2L, 0L), (2L, 1L), (3L, 0L), (3L, 1L),
      (4L, 0L), (4L, 1L), (5L, 0L), (5L, 1L)).toDF("src", "dst")
    val nodes = (0L to 5L).toDF("id")
    val fixed = KnnGraph.pageRank(edges, nodes, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val degreed = KnnGraph.pageRank(edges, nodes, k = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(degreed === fixed, "degree-aware path diverges on a regular graph")
    // irregular: the real RNG-refined graph over the fixture corpus —
    // variable out-degree after the prune; every source node must conserve
    // rank mass up to flooring
    val g = KnnGraph.rngRefine(
      KnnGraph.build(corpus, dims = 6, neighborhoodSize = 8, trees = 2),
      corpus, maxNeighbors = 4)
    val ids = g.select(col("src").as("id"))
      .union(g.select(col("dst"))).distinct()
    val prs = KnnGraph.pageRank(g.select("src", "dst"), ids, k = 0)
    val total = prs.agg(sum("pr")).head().getLong(0)
    // no sinks (every corpus node emits an RNG list), so the only loss is
    // floor-division dust: total stays within 1e6 units of the 1e12 scale
    assert(total <= 1000000000000L && total > 1000000000000L - 1000000L,
      s"mass off: $total")
  }

  test("triangles: hand graph counts, clustering coefficients, dup/reverse edges collapse") {
    import spark.implicits._
    // triangle 1-2-3, pendant 3-4, triangle-free square 5-6-7-8; every
    // edge listed twice (both directions) plus one duplicate and a
    // self-loop — symmetrize/dedup must collapse them all
    val base = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L),
      (5L, 6L), (6L, 7L), (7L, 8L), (8L, 5L))
    val noisy = base ++ base.map(_.swap) ++ Seq((1L, 2L), (6L, 6L))
    val got = KnnGraph.triangles(noisy.toDF("src", "dst"))
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, 0.333333), (4L, 1L, 0L, 0.0),
      (5L, 2L, 0L, 0.0), (6L, 2L, 0L, 0.0),
      (7L, 2L, 0L, 0.0), (8L, 2L, 0L, 0.0)))
  }

  test("triangles on K4: every node in 3 triangles, clustering 1.0") {
    import spark.implicits._
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val got = KnnGraph.triangles(k4)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got === (1L to 4L).map(i => (i, 3L, 3L, 1.0)))
  }

  test("kCore: multi-round peel on a hand graph — pendant chain unravels, triangle stays") {
    import spark.implicits._
    // triangle (1,2,3) + chain 3-4-5: node 4 has degree 2 until 5 peels,
    // so the 2-core needs SEQUENTIAL rounds, not one sweep
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = KnnGraph.kCore(edges, 2)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k above the max degree empties the graph
    assert(KnnGraph.kCore(edges, 4).count() === 0)
  }

  test("kCore: exhausting maxRounds before fixpoint throws; the explicit " +
      "fixed-round opt-out returns the truncated supergraph") {
    import spark.implicits._
    // a 6-node path needs 3 peel rounds to empty its 2-core (both pendant
    // ends unravel one step per round); maxRounds = 1 is short of fixpoint
    val path = (1L to 5L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      KnnGraph.kCore(path, 2, maxRounds = 1)
    }
    // the r9 advice failure mode, now opt-in only: sub-k degrees survive
    val truncated = KnnGraph.kCore(path, 2, maxRounds = 1, requireFixpoint = false)
      .as[(Long, Long)].collect().toMap
    assert(truncated.nonEmpty && truncated.values.exists(_ < 2))
    // and at fixpoint the 2-core of a path is empty
    assert(KnnGraph.kCore(path, 2).count() === 0)
  }

  test("kCore equals a plain-Scala peel reference on random graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val edges = (1 to 300).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    def refCore(k: Int): Map[Long, Int] = {
      var und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter(e => e._1 != e._2).distinct
      var stable = false
      while (!stable) {
        val deg = und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (id, xs) => (id, xs.size) }
        val surv = deg.filter(_._2 >= k).keySet
        val pruned = und.filter(e => surv(e._1) && surv(e._2))
        stable = pruned.size == und.size
        und = pruned
      }
      und.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (id, xs) => (id, xs.size) }
    }
    for (k <- Seq(2, 3, 5)) {
      val got = KnnGraph.kCore(edges.toDF("src", "dst"), k)
        .as[(Long, Long)].collect().map { case (id, d) => (id, d.toInt) }.toMap
      assert(got === refCore(k), s"k=$k")
    }
  }

  test("mutualKnn keeps exactly the reciprocal pairs, canonicalized a < b") {
    import spark.implicits._
    // 1↔2 mutual, 1→3 one-sided, 3↔4 mutual (given reversed), 5→5 ignored
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val got = KnnGraph.mutualKnn(edges).as[(Long, Long)].collect().sorted
    assert(got.toSeq === Seq((1L, 2L), (3L, 4L)))
  }

  test("labelPropagate: clamped seeds, majority adoption, deterministic ties") {
    import spark.implicits._
    // chain 1 → 2 → 3 (edges point INTO the adopter); node 2 hears one 'a'
    // round 1, node 3 hears it round 2; node 4 hears 'a' and 'b' equally —
    // tie breaks to the smaller label 'a'; seed node 5 keeps 'b' despite
    // an incoming 'a' edge (clamped)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 4L), (5L, 4L), (1L, 5L))
      .toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("id")
    val seeds = Seq((1L, "a"), (5L, "b")).toDF("id", "label")
    val r1 = KnnGraph.labelPropagate(edges, nodes, seeds, 1)
      .as[(Long, String)].collect().toMap
    assert(r1 === Map(1L -> "a", 2L -> "a", 4L -> "a", 5L -> "b"))
    val r2 = KnnGraph.labelPropagate(edges, nodes, seeds, 2)
      .as[(Long, String)].collect().toMap
    assert(r2(3L) === "a" && r2(2L) === "a" && r2(5L) === "b")
  }

  test("silhouette: analytic two-cluster fixture; coincident-centroid s = 0") {
    import spark.implicits._
    import graft.operators.Eval
    // heads at distinct points on the 1-D line embedded in 2-D via l2sq;
    // vector (1,0) sits ON head 10 → a = 0, b = 4 → s = 1; vector (2,0)
    // is equidistant (1) from head 10 and head 20 → wait, use clean gaps
    val heads = Seq((10L, Seq(0.0, 0.0)), (20L, Seq(4.0, 0.0)))
      .toDF("head_id", "head_vec")
    val vecs = Seq(
      (1L, Seq(0.0, 0.0)),  // on head 10: a=0,  b=16 → s=1
      (2L, Seq(1.0, 0.0)),  // a=1 (h10), b=9 (h20) → s=(9-1)/9
      (3L, Seq(4.0, 0.0)))  // on head 20: a=0, b=16 → s=1
      .toDF("id", "vec")
    val got = Eval.silhouette(vecs, heads, "l2sq")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(10L)._1 === 2L)
    assert(math.abs(got(10L)._2 - (1.0 + 8.0 / 9.0) / 2) < 1e-5)
    assert(got(20L) === ((1L, 1.0)))
    // both distances zero (vector on two coincident centroids) → s = 0
    val co = Seq((10L, Seq(0.0, 0.0)), (20L, Seq(0.0, 0.0)))
      .toDF("head_id", "head_vec")
    val one = Seq((1L, Seq(0.0, 0.0))).toDF("id", "vec")
    val s0 = Eval.silhouette(one, co, "l2sq").collect()
    assert(s0.length === 1 && s0(0).getDouble(2) === 0.0)
  }

  test("hits: authorities collect in-link mass, hubs collect out-link " +
      "mass; L1 mass ≈ Scale after renorm") {
    import spark.implicits._
    // bipartite-ish: 1,2,3 all point at 4 and 5; 4 points at 5
    val edges = Seq((1L, 4L), (1L, 5L), (2L, 4L), (2L, 5L), (3L, 4L),
      (3L, 5L), (4L, 5L)).toDF("src", "dst")
    val nodes = (1L to 5L).toDF("id")
    val got = KnnGraph.hits(edges, nodes, iters = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // 5 is the best authority (4 in-links incl. from semi-authority 4);
    // pure sources 1-3 are equal hubs with zero authority
    assert(got(5L)._2 > got(4L)._2, s"5 outranks 4 as authority: $got")
    assert(got(1L) === got(2L) && got(2L) === got(3L), "symmetric hubs tie")
    assert(got(1L)._2 === 0L && got(5L)._1 === 0L,
      "no in-links → auth 0; no out-links → hub 0")
    val hubMass = got.values.map(_._1).sum
    val authMass = got.values.map(_._2).sum
    assert(hubMass > 999999990L && hubMass <= 1000000000L, s"hub: $hubMass")
    assert(authMass > 999999990L && authMass <= 1000000000L, s"auth: $authMass")
  }

  test("hits equals a plain-Scala integer reference on random digraphs") {
    import spark.implicits._
    val Scale = 1000000000L
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 5 + rng.nextInt(10)
      val edgeSeq = (0L until n.toLong).flatMap { src =>
        rng.shuffle((0L until n.toLong).filter(_ != src).toList).take(2)
          .map(dst => (src, dst))
      }
      var hub = Array.fill(n)(Scale / n)
      var auth = Array.fill(n)(0L)
      def renorm(a: Array[Long]): Array[Long] = {
        val t = math.max(a.sum, 1L)
        a.map(x => x * Scale / t)
      }
      for (_ <- 1 to 2) {
        val ap = Array.fill(n)(0L)
        for ((s, d) <- edgeSeq) ap(d.toInt) += hub(s.toInt)
        auth = renorm(ap)
        val hp = Array.fill(n)(0L)
        for ((s, d) <- edgeSeq) hp(s.toInt) += auth(d.toInt)
        hub = renorm(hp)
      }
      val got = KnnGraph.hits(
        edgeSeq.toDF("src", "dst"), (0L until n.toLong).toDF("id"), 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      for (i <- 0 until n)
        assert(got(i.toLong) === ((hub(i), auth(i))), s"node $i of n=$n")
    }
  }

  test("clusterPurity: majority share per cluster, ties to smaller label") {
    import spark.implicits._
    import graft.operators.Eval
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L), (5L, 20L))
      .toDF("id", "cluster")
    val labels = Seq((1L, 7), (2L, 7), (3L, 8), (4L, 9), (5L, 3))
      .toDF("id", "label")
    val got = Eval.clusterPurity(assign, labels).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2), r.getDouble(3))))
      .toMap
    assert(got(10L) === ((3L, 7, BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(got(20L) === ((2L, 3, 0.5)), "1-1 tie picks the smaller label")
    // non-numeric labels work too (the negate-trick regression): ties
    // break to the lexicographically smaller string
    val slab = Seq((1L, "fr"), (2L, "en"), (3L, "en"), (4L, "de"),
      (5L, "fr")).toDF("id", "label")
    val gs = Eval.clusterPurity(assign, slab).collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getDouble(3)))).toMap
    assert(gs(10L) === (("en", BigDecimal(2.0 / 3).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(gs(20L) === (("de", 0.5)), "string tie → lexicographic min")
  }

  test("clusterNmi: perfect clustering → nmi 1; single label → nmi 0") {
    import spark.implicits._
    import graft.operators.Eval
    val assign = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L))
      .toDF("id", "cluster")
    val perfect = Seq((1L, 1), (2L, 1), (3L, 2), (4L, 2)).toDF("id", "label")
    val gp = Eval.clusterNmi(assign, perfect).collect()(0)
    assert(gp.getDouble(4) === 1.0, s"perfect match is NMI 1: $gp")
    assert(math.abs(gp.getDouble(1) - math.log(2)) < 1e-6)
    val const = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 1)).toDF("id", "label")
    val gc = Eval.clusterNmi(assign, const).collect()(0)
    assert(gc.getDouble(1) === 0.0 && gc.getDouble(4) === 0.0,
      s"degenerate single-label margin: $gc")
  }

  test("knnStability: overlap histogram over shared sources only; " +
      "zero-overlap nodes kept") {
    import spark.implicits._
    val a = Seq((1L, 2L), (1L, 3L), (2L, 1L), (2L, 3L), (3L, 1L), (3L, 2L),
      (5L, 1L)).toDF("src", "dst")
    // node 3 absent from snapshot B; node 5 rewired entirely
    val b = Seq((1L, 2L), (1L, 4L), (2L, 1L), (2L, 3L), (5L, 2L))
      .toDF("src", "dst")
    val got = KnnGraph.knnStability(a, b).as[(Long, Long)].collect()
      .toSeq.sorted
    // src 1: {2} common → 1; src 2: {1,3} → 2; src 5: ∅ → 0
    assert(got === Seq((0L, 1L), (1L, 1L), (2L, 1L)))
  }

  test("personalizedPageRank: mass stays in the seed component; equals a " +
      "plain-Scala integer reference") {
    import spark.implicits._
    val Scale = 1000000000000L
    // 1,2 form a 2-cycle; 3,4 form a separate 2-cycle; seed = {1}
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 4L), (4L, 3L))
      .toDF("src", "dst")
    val nodes = (1L to 4L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val got = KnnGraph.personalizedPageRank(edges, nodes, seeds, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) === 0L && got(4L) === 0L,
      s"unreachable component must hold zero mass: $got")
    assert(got(1L) > 0L && got(2L) > 0L)
    // reference: same fixed-point arithmetic in plain Scala on a random
    // out-regular digraph with a random seed subset
    val rng = new scala.util.Random(23)
    val n = 10; val k = 2
    val edgeSeq = (0L until n.toLong).flatMap { src =>
      rng.shuffle((0L until n.toLong).filter(_ != src).toList).take(k)
        .map(dst => (src, dst))
    }
    val seedIds = (0L until n.toLong).filter(_ % 3 == 0)
    val ns = seedIds.length
    var ref = Array.tabulate(n)(i =>
      if (i % 3 == 0) Scale / ns else 0L)
    for (_ <- 1 to 3) {
      val in = Array.fill(n)(0L)
      for ((s, d) <- edgeSeq) in(d.toInt) += ref(s.toInt) * 85L / (100L * k)
      ref = Array.tabulate(n)(i =>
        (if (i % 3 == 0) (15L * Scale) / (100L * ns) else 0L) + in(i))
    }
    val got2 = KnnGraph.personalizedPageRank(
      edgeSeq.toDF("src", "dst"), (0L until n.toLong).toDF("id"),
      seedIds.toDF("id"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0 until n) assert(got2(i.toLong) === ref(i), s"node $i")
  }
}
