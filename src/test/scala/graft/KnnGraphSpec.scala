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
}
