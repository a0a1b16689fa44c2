package graft

import org.apache.spark.sql.functions._

import graft.operators.KdTree

/** B5 KD-tree: level-synchronous variance splits + tree-routed search
  * (`Common/KDTree.h:275-399` semantics, deterministic dim choice).
  */
class KdTreeSpec extends SparkSpec {
  import spark.implicits._

  private def toVec(rows: Seq[(Long, Seq[Double])]) =
    rows.toDF("id", "vec")

  test("build splits on the max-variance dimension at its mean") {
    // dim 2 has variance 2500 (values 0/100), dim 1 has 0.25 (values 0/1)
    val pts = toVec(Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.0, 100.0)), (4L, Seq(1.0, 100.0))))
    val (splits, assign) = KdTree.build(pts, dim = 2, depth = 1)
    val s = splits.collect()
    assert(s.length === 1)
    assert(s.head.getAs[Long]("node") === 1L)
    assert(s.head.getAs[Int]("split_dim") === 2)
    assert(s.head.getAs[Double]("split_val") === 50.0)
    val leaves = assign.collect().map(r => r.getLong(0) -> r.getAs[Long]("leaf")).toMap
    // value <= mean goes left (node 2), else right (node 3)
    assert(leaves(1L) === 2L && leaves(2L) === 2L)
    assert(leaves(3L) === 3L && leaves(4L) === 3L)
  }

  test("dimRank selects the t-th best variance dim (multi-tree choice)") {
    val pts = toVec(Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)),
      (3L, Seq(0.0, 100.0)), (4L, Seq(10.0, 100.0))))
    val (splits, _) = KdTree.build(pts, dim = 2, depth = 1, dimRank = 1)
    assert(splits.head().getAs[Int]("split_dim") === 1,
      "rank 1 must pick the SECOND-highest variance dim")
  }

  test("dimRank falls back to the best dim when its own pick is degenerate") {
    // only dim 2 varies: a dimRank=1 tree's 2nd-ranked dim is constant, but
    // the node IS divisible — the pick must fall back to dim 2, not turn the
    // whole corpus into one terminal leaf
    val pts = toVec(Seq(
      (1L, Seq(7.0, 0.0)), (2L, Seq(7.0, 10.0)),
      (3L, Seq(7.0, 20.0)), (4L, Seq(7.0, 30.0))))
    val (splits, assign) = KdTree.build(pts, dim = 2, depth = 1, dimRank = 1)
    val s = splits.collect()
    assert(s.length === 1, "divisible root must split despite the degenerate rank-1 dim")
    assert(s.head.getAs[Int]("split_dim") === 2)
    assert(assign.select("leaf").distinct().count() === 2)
    // truly indivisible corpus still stops: every dim constant
    val const = toVec(Seq((1L, Seq(7.0, 3.0)), (2L, Seq(7.0, 3.0))))
    val (s2, a2) = KdTree.build(const, dim = 2, depth = 1, dimRank = 1)
    assert(s2.count() === 0)
    assert(a2.select("leaf").distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("variance ties break to the lowest dimension") {
    val pts = toVec(Seq((1L, Seq(0.0, 0.0)), (2L, Seq(4.0, 4.0))))
    val (splits, _) = KdTree.build(pts, dim = 2, depth = 1)
    assert(splits.head().getAs[Int]("split_dim") === 1)
  }

  test("depth-3 build over the fixture corpus fills all 8 leaves near-evenly") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), transform(col("vec"),
        x => round(x.cast("double") * 1000).cast("long").cast("double")).as("vec"))
    val (splits, assign) = KdTree.build(corpus, dim = 6, depth = 3)
    assert(splits.count() === 7L, "1 + 2 + 4 internal nodes")
    val sizes = assign.groupBy("leaf").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keySet === (8L to 15L).toSet, s"leaves ${sizes.keySet}")
    val n = sizes.values.sum
    // mean splits keep leaves within 2x of perfect balance on this data
    assert(sizes.values.forall(c => c > n / 16 && c < n / 4), s"sizes $sizes")
  }

  test("searchLeaf routes a corpus point's own vector to itself at rank 1") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val (splits, assign) = KdTree.build(corpus, dim = 6, depth = 2)
    val queries = corpus.where(col("id").isin(3L, 77L, 500L))
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val top1 = KdTree.searchLeaf(queries, splits, assign, depth = 2, k = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(top1.keySet === Set(3L, 77L, 500L))
    top1.foreach { case (q, (hit, dist)) =>
      assert(hit === q && dist === 0.0, s"query $q found ($hit, $dist)")
    }
  }

  test("searchBeam with a full-width beam IS exact kNN; beam 1 IS the leaf descent") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val (splits, assign) = KdTree.build(corpus, dim = 6, depth = 2)
    val queries = Tables.ordersQuery(spark, sf0001)
      .where(col("query_id") < 10)
      .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // beam = 2^depth keeps every leaf → identical to exact brute-force kNN
    val full = rows(KdTree.searchBeam(queries, splits, assign, 2, k = 5, beam = 4))
    val exact = rows(graft.operators.Knn.search(queries, corpus, 5, "l2sq"))
    assert(full === exact, "full-width beam must reproduce exact kNN")
    // beam = 1 degenerates to the tree-only single-leaf descent
    val one = rows(KdTree.searchBeam(queries, splits, assign, 2, k = 5, beam = 1))
    val leaf = rows(KdTree.searchLeaf(queries, splits, assign, 2, k = 5))
    assert(one === leaf, "beam 1 must equal searchLeaf")
    // intermediate beams can only add candidates: recall vs exact is monotone
    def recall(s: Set[(Long, Int, Long)]) =
      s.map(t => (t._1, t._3)).intersect(exact.map(t => (t._1, t._3))).size
    val mid = rows(KdTree.searchBeam(queries, splits, assign, 2, k = 5, beam = 2))
    assert(recall(one) <= recall(mid) && recall(mid) <= recall(full),
      s"recall not monotone in beam: ${recall(one)}/${recall(mid)}/${recall(full)}")
  }

  test("searchForest unions diversified trees; one tree degenerates to searchBeam") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val trees = Seq(0, 1).map(r => KdTree.build(corpus, dim = 6, depth = 2, dimRank = r))
    val queries = Tables.ordersQuery(spark, sf0001)
      .where(col("query_id") < 10)
      .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
    def hits(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(graft.operators.Knn.search(queries, corpus, 5, "l2sq"))
    val single = hits(KdTree.searchBeam(
      queries, trees.head._1, trees.head._2, 2, k = 5, beam = 1))
    val forest = hits(KdTree.searchForest(queries, trees, 2, k = 5, beam = 1))
    // the second tree splits on different dims → its leaves cut the space
    // differently; the union can only widen the candidate pool
    assert(forest.intersect(exact).size >= single.intersect(exact).size,
      s"forest recall ${forest.intersect(exact).size} < single ${single.intersect(exact).size}")
    val one = hits(KdTree.searchForest(queries, Seq(trees.head), 2, k = 5, beam = 1))
    assert(one === single, "a one-tree forest must equal searchBeam")
  }

  test("save/load roundtrips the tree and stored search partition-prunes on leaf_bucket") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val (splits, assign) = KdTree.build(corpus, dim = 6, depth = 2)
    val dir = java.nio.file.Files.createTempDirectory("kdt").toString
    KdTree.save(dir, splits, assign, depth = 2, leafBuckets = 4)
    val st = KdTree.load(spark, dir)
    assert(st.depth === 2 && st.leafBuckets === 4)
    assert(st.splits.collect().toSet === splits.collect().toSet)
    assert(st.assign.select("id", "leaf").collect().toSet ===
      assign.select("id", "leaf").collect().toSet)
    val queries = Tables.ordersQuery(spark, sf0001)
      .where(col("query_id") < 5)
      .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
    val live = KdTree.searchBeam(queries, splits, assign, 2, k = 5, beam = 2)
      .select("query_id", "rank", "id").collect().toSet
    val stored = KdTree.searchStored(queries, st, k = 5, beam = 2)
    assert(stored.select("query_id", "rank", "id").collect().toSet === live,
      "stored-tree search must reproduce the live search")
    // the assign join keys on the partition column → dynamic pruning
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic-pruning subquery over leaf_bucket in:\n$plan")
  }

  test("indivisible nodes become terminal leaves: appended vectors and queries are never dropped") {
    // left child of the root holds three IDENTICAL points → no split row
    // below it; right child keeps splitting. Before the leaf-stop semantics
    // the inner joins silently dropped anything routed into a split-less node.
    val pts = toVec(Seq(
      (1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)), (3L, Seq(0.0, 0.0)),
      (4L, Seq(10.0, 0.0)), (5L, Seq(10.0, 5.0)), (6L, Seq(10.0, 9.0))))
    val (splits, assign) = KdTree.build(pts, dim = 2, depth = 3)
    val leaves = assign.collect().map(r => r.getLong(0) -> r.getAs[Long]("leaf")).toMap
    assert(leaves.keySet === (1L to 6L).toSet, "build must keep every point")
    assert(Set(1L, 2L, 3L).map(leaves) === Set(2L),
      "identical points stay at the indivisible node 2")
    // splits exist only for divisible nodes: root, node 3, node 7
    val splitNodes = splits.select("node").collect().map(_.getLong(0)).toSet
    assert(!splitNodes.contains(2L), "indivisible node must emit no split row")
    // ADVICE fix: a vector appended into the indivisible subtree lands AT the
    // terminal leaf instead of vanishing
    val added = KdTree.assignTo(toVec(Seq((7L, Seq(0.0, 1.0)))), splits, depth = 3)
      .collect()
    assert(added.length === 1 && added.head.getAs[Long]("leaf") === 2L)
    // ADVICE fix: a query routed into the terminal leaf still returns k rows
    val queries = Seq((100L, Seq(0.0, 0.5)), (101L, Seq(10.0, 4.0)))
      .toDF("query_id", "qvec")
    val leafHits = KdTree.searchLeaf(queries, splits, assign, depth = 3, k = 2)
      .collect().groupBy(_.getLong(0))
    assert(leafHits(100L).length === 2, "query into terminal leaf must get k results")
    assert(leafHits(100L).map(_.getLong(2)).toSet.subsetOf(Set(1L, 2L, 3L)))
    assert(leafHits(101L).nonEmpty)
    val beamHits = KdTree.searchBeam(queries, splits, assign, depth = 3, k = 2, beam = 2)
      .collect().groupBy(_.getLong(0))
    assert(beamHits(100L).length === 2 && beamHits(101L).length === 2)
    // the searched union (assign + appended) also finds the appended vector
    val all = assign.unionByName(
      KdTree.assignTo(toVec(Seq((7L, Seq(0.0, 1.0)))), splits, depth = 3))
    val top1 = KdTree.searchLeaf(
      Seq((200L, Seq(0.0, 1.0))).toDF("query_id", "qvec"), splits, all,
      depth = 3, k = 1).collect()
    assert(top1.length === 1 && top1.head.getLong(2) === 7L,
      "appended vector must be findable at rank 1 for its own position")
  }

  test("deep-tree broadcast guard: past bcastLimit the split join is not broadcast") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (s0, a0) = KdTree.build(corpus, dim = 6, depth = 3)
      val (s1, a1) = KdTree.build(corpus, dim = 6, depth = 3, bcastLimit = 0L)
      assert(s1.collect().toSet === s0.collect().toSet,
        "guarded build must produce identical splits")
      assert(a1.select("id", "leaf").collect().toSet ===
        a0.select("id", "leaf").collect().toSet)
      val queries = Tables.ordersQuery(spark, sf0001)
        .where(col("query_id") < 5)
        .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
      val hinted = KdTree.searchLeaf(queries, s0, a0, depth = 3, k = 3)
      // the guarded search must run over the guarded build's frames — a0's
      // lineage carries the default build's broadcast-hinted routing joins
      val guarded = KdTree.searchLeaf(queries, s1, a1, depth = 3, k = 3,
        bcastLimit = 0L)
      assert(guarded.select("query_id", "rank", "id").collect().toSet ===
        hinted.select("query_id", "rank", "id").collect().toSet,
        "guard must not change results")
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "within the limit the split join broadcasts")
      assert(!guarded.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "past the limit no split-table broadcast may remain")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("searchLeaf results are the exact top-k restricted to the query's leaf") {
    val corpus = Tables.lineitemVec(spark, sf0001)
      .select(col("id"), col("vec").cast("array<double>").as("vec"))
    val (splits, assign) = KdTree.build(corpus, dim = 6, depth = 2)
    val queries = Tables.ordersQuery(spark, sf0001)
      .where(col("query_id") < 5)
      .select(col("query_id"), col("qvec").cast("array<double>").as("qvec"))
    val got = KdTree.searchLeaf(queries, splits, assign, depth = 2, k = 5).collect()
    assert(got.map(_.getLong(0)).distinct.length === 5)
    // per query: ranks are 1..5 with non-decreasing distances
    got.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to 5))
      val d = sorted.map(_.getDouble(3))
      assert(d.zip(d.tail).forall { case (a, b) => a <= b })
    }
  }
}
