package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** BKT-algo facade: the AlgoTest phase sequence (`Test/src/AlgoTest.cpp:
  * 230-242`) replayed against [[BktIndex]] — build → search → add → search
  * → delete → search → refine → save → load → search — plus the stored-graph
  * partition-pruning contract.
  */
class BktIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshIndex = BktIndex(
    spark, synthVectors(1000), dim = 10,
    kClusters = 8, nbr = 8, nprobe = 2, seeds = 4, beam = 8, rounds = 3)

  test("build → search finds each query's exact neighbor (AlgoTest search phase)") {
    val idx = freshIndex.build()
    val res = idx.search(synthQueries(3), 3).orderBy("query_id", "rank").collect()
    for (t <- 0 until 3) {
      val top = res.filter(_.getLong(0) == t).head
      assert(top.getLong(2) === 2L * t, s"query $t top hit ${top.getLong(2)}")
      assert(top.getDouble(3) === 0.0)
    }
  }

  test("graph walk recovers neighbors beyond the probed seed set") {
    // nprobe=1, seeds=2: the seed phase alone (pure cluster probe) surfaces
    // at most 2 of each query's true top-6; the walk's expansion must pull
    // in strictly more — the property that separates BKT search from IVF
    def hits(rounds: Int): Long = {
      val idx = BktIndex(spark, synthVectors(1000), dim = 10,
        kClusters = 8, nbr = 8, nprobe = 1, seeds = 2, beam = 8,
        rounds = rounds).build()
      val q = synthQueries(3)
      val exact = operators.Knn.search(q,
        synthVectors(1000).select(col("id"), col("vec")), 6)
      idx.search(q, 6).select("query_id", "id")
        .join(exact.select("query_id", "id"), Seq("query_id", "id"), "left_semi")
        .count()
    }
    val seedOnly = hits(0) // ≤ 2 seeds per query can hit at most 6 total
    val walked = hits(4)
    assert(seedOnly <= 6, s"seed-only should be capped by the seed count: $seedOnly")
    assert(walked > seedOnly, s"walk must beat seed-only: $walked vs $seedOnly")
    assert(walked >= 12, s"walk recall too low: $walked/18")
  }

  test("add links new vectors into the graph; delete tombstones them") {
    val idx = freshIndex.build()
    val batch = Seq((5000L, Seq.fill(10)(1500f))).toDF("id", "vec")
    val grown = idx.add(batch)
    assert(grown.count === 1001)
    val q = Seq((0L, Seq.fill(10)(1499f))).toDF("query_id", "qvec")
    assert(grown.search(q, 1).head().getLong(2) === 5000L,
      "appended vector must be findable without a rebuild")
    val shrunk = grown.deleteByIds(Seq(5000L))
    assert(shrunk.search(q, 1).head().getLong(2) !== 5000L,
      "tombstoned vector must not surface")
    assert(shrunk.count === 1000)
  }

  test("needRefine trips on the tombstone fraction; refine compacts and rebuilds") {
    val idx = freshIndex.build()
    val manyDeletes = idx.deleteByIds((0L until 500L).toSeq)
    assert(!idx.needRefine())
    assert(manyDeletes.needRefine())
    val refined = manyDeletes.refineIndex()
    assert(refined.count === 500)
    assert(!refined.needRefine())
    val q = Seq((0L, Seq.fill(10)(750f))).toDF("query_id", "qvec")
    assert(refined.search(q, 1).head().getLong(2) === 750L)
  }

  test("save → load reproduces search results; stored walk partition-prunes") {
    val idx = freshIndex.build()
    val dir = Files.createTempDirectory("bktidx").toString
    idx.save(dir, edgeBuckets = 8)
    val loaded = BktIndex.load(spark, dir)
    assert(loaded.dim === 10 && loaded.kClusters === 8 &&
      loaded.nbr === 8 && loaded.srcBuckets === Some(8))
    val q = synthQueries(3)
    val a = idx.search(q, 3).select("query_id", "rank", "id").collect().toSet
    val b = loaded.search(q, 3).select("query_id", "rank", "id").collect().toSet
    assert(a === b, "loaded index must reproduce the live index's results")
    // the stored layout must actually be USED: an expansion round against
    // the bucketed edges keys on src_bucket → dynamic-pruning subquery
    // localCheckpoint mirrors the walk loop's real frontier state (an RDD
    // scan — DPP does not fire against a LocalRelation build side)
    val frontier = Seq((0L, 10L, 0.0), (1L, 500L, 0.0))
      .toDF("query_id", "id", "dist").localCheckpoint(true)
    val plan = operators.KnnGraph.expandCandidates(
      frontier, spark.read.parquet(s"$dir/edges"), Some(8))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"stored-graph expansion must partition-prune on src_bucket; plan:\n${plan.take(3000)}")
  }

  test("filtered search: non-passing ids conduct the walk but never surface") {
    val idx = freshIndex.build()
    val q = synthQueries(3)
    // only even ids pass; each query t sits exactly ON corpus point 2t
    val passing = spark.range(1000).where(col("id") % 2 === 0).select(col("id"))
    val res = idx.searchFiltered(q, 3, passing).cache()
    assert(res.where(col("id") % 2 =!= 0).count() === 0,
      "odd (filtered-out) ids must not surface")
    // the exact even neighbor is still rank 1 at dist 0
    val tops = res.where(col("rank") === 1).orderBy("query_id").collect()
    for (t <- 0 until 3) assert(tops(t).getLong(2) === 2L * t)
    // each query still surfaces multiple passing results (a filtered walk
    // may return < k within its check budget — reference semantics too)
    val perQuery = res.groupBy("query_id").count()
      .collect().map(_.getLong(1))
    assert(perQuery.length === 3 && perQuery.forall(_ >= 2),
      s"per-query filtered results: ${perQuery.toSeq}")
  }

  test("iterate serves disjoint batches; relaxed_mono flags past the budget") {
    val idx = freshIndex.build()
    val it = idx.iterate(synthQueries(3), exactBudget = 4, maxK = 8)
    try {
      val first = it.next(4).cache()
      val second = it.next(4).cache()
      // disjoint, contiguous ranks
      assert(first.select("query_id", "id")
        .intersect(second.select("query_id", "id")).count() === 0)
      assert(first.agg(max("rank")).head().getInt(0) <= 4)
      assert(first.where(col("relaxed_mono")).count() === 0,
        "batch inside the exact budget must not be relaxed")
      assert(second.where(!col("relaxed_mono")).count() === 0,
        "batch past the exact budget must carry relaxed_mono")
    } finally it.close()
  }

  test("add + delete on a LOADED index keep the bucketed layout consistent") {
    val dir = Files.createTempDirectory("bktidx2").toString
    freshIndex.build().save(dir, edgeBuckets = 8)
    val loaded = BktIndex.load(spark, dir)
    val grown = loaded.add(Seq((5000L, Seq.fill(10)(1500f))).toDF("id", "vec"))
    assert(grown.count === 1001)
    val q = Seq((0L, Seq.fill(10)(1499f))).toDF("query_id", "qvec")
    assert(grown.search(q, 1).head().getLong(2) === 5000L,
      "vector appended to a loaded index must be findable")
    val shrunk = grown.deleteByIds(Seq(5000L))
    assert(shrunk.search(q, 1).head().getLong(2) !== 5000L)
  }
}
