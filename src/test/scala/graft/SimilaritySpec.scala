package graft

import org.apache.spark.sql.functions._

import graft.operators.{Eval, SimilaritySearch}

class SimilaritySpec extends SparkSpec {

  private lazy val emb = Tables.embeddingVec(spark, sf0001).cache()
  private lazy val queries = emb.where(col("id") < 10)
    .select(col("id").as("query_id"), col("vec").as("qvec")).cache()

  test("brute-force cosine: self is always the top-1 result at dist 0") {
    val res = SimilaritySearch.bruteForce(queries, emb, 5)
      .where(col("rank") === 1).orderBy("query_id").collect()
    res.foreach { r =>
      assert(r.getLong(2) === r.getLong(0)) // id == query_id
      assert(r.getDouble(3) === 0.0)
    }
  }

  test("IVF recall@10 vs brute force at nprobe=4/20 centroids") {
    // the synthetic embeddings are near-uniform random (no cluster
    // structure), the worst case for IVF — 4/20 probes lands ~0.5 recall;
    // the monotonicity test below is the structural invariant
    val exact = SimilaritySearch.bruteForce(queries, emb, 10)
    val ivf = SimilaritySearch.ivfSearch(queries, emb, 10, 25, 4)
    val rec = Eval.recallSummary(Eval.recallAt(ivf, exact, 10)).head()
    assert(rec.getDouble(0) >= 0.45, s"avg recall ${rec.getDouble(0)}")
  }

  test("more probes → recall never decreases") {
    val exact = SimilaritySearch.bruteForce(queries, emb, 10)
    def rec(np: Int): Double =
      Eval.recallSummary(Eval.recallAt(
        SimilaritySearch.ivfSearch(queries, emb, 10, 25, np), exact, 10))
        .head().getDouble(0)
    assert(rec(8) >= rec(2) - 1e-9)
  }

  test("LSH codes: identical vectors share a code; planes produce spread") {
    val codes = SimilaritySearch.lshCodes(emb, dims = 64)
    val n = codes.count()
    val distinct = codes.select("code").distinct().count()
    assert(n === 500)
    assert(distinct > 10, s"only $distinct distinct codes") // non-degenerate
    // deterministic
    val again = SimilaritySearch.lshCodes(emb, dims = 64)
    assert(codes.exceptAll(again).count() === 0)
  }

  test("banded LSH near-dup: sound vs the brute oracle, and non-trivial recall") {
    import spark.implicits._
    import graft.operators.Dedup
    val brute = Dedup.embeddingPairs(emb, 0.6)
      .select("a", "b", "cos_dist").as[(Long, Long, Double)].collect()
      .map { case (a, b, cd) => (a, b) -> cd }.toMap
    val lsh = SimilaritySearch.lshNearDup(emb, dims = 64, maxCosDist = 0.6)
      .select("a", "b", "cos_dist").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "banded blocking surfaced no candidates")
    // 4 bands of 2 planes recover most of the exact pair set at this
    // threshold (86% on this fixture) — guard the recall floor so a banding
    // regression is caught here, not by a shrinking q36 row count
    assert(lsh.length >= (0.7 * brute.size).toInt,
      s"LSH recall collapsed: ${lsh.length} of ${brute.size} exact pairs")
    // soundness: every reported pair IS a brute pair with the same distance
    lsh.foreach { case (a, b, cd) =>
      assert(brute.contains((a, b)), s"($a,$b) not in the brute pair set")
      assert(math.abs(brute((a, b)) - cd) < 1e-9)
    }
    // no duplicates despite multi-band agreement
    assert(lsh.map(p => (p._1, p._2)).distinct.length === lsh.length)
  }

  test("LSH-blocked search: self is rank-1, distances exact, results ⊆ corpus") {
    import spark.implicits._
    val res = SimilaritySearch.lshSearch(queries, emb, dims = 64, k = 10)
    val byQ = res.select("query_id", "rank", "id", "dist")
      .as[(Long, Int, Long, Double)].collect().groupBy(_._1)
    assert(byQ.size === 10)
    // a query always shares every band with itself → candidate → dist 0, rank 1
    byQ.foreach { case (q, rows) =>
      val top = rows.find(_._2 == 1).get
      assert(top._3 === q && top._4 === 0.0, s"query $q top-1 is not itself")
    }
    // every reported distance equals the exact distance for that pair
    val exact = SimilaritySearch.bruteForce(queries, emb, 500)
      .select("query_id", "id", "dist").as[(Long, Long, Double)].collect()
      .map { case (q, i, d) => (q, i) -> d }.toMap
    byQ.values.flatten.foreach { case (q, _, i, d) =>
      assert(exact((q, i)) === d, s"pair ($q,$i) dist drifted from exact")
    }
    // banded blocking keeps useful recall (0.82 avg at sf0.01; floor is the
    // regression tripwire, not the target)
    val rec = Eval.recallSummary(Eval.recallAt(
      res, SimilaritySearch.bruteForce(queries, emb, 10), 10)).head().getDouble(0)
    assert(rec >= 0.5, s"LSH search avg recall collapsed: $rec")
  }

  test("planeWeight matches the Hash60 definition") {
    import graft.functions.Hash60
    import spark.implicits._
    val df = Seq("0_0", "3_17", "7_63").toDF("s")
      .select(Hash60(col("s")).as("h")).collect().map(_.getLong(0))
    assert(df(0) % 2001 - 1000 === SimilaritySearch.planeWeight(0, 0))
    assert(df(1) % 2001 - 1000 === SimilaritySearch.planeWeight(3, 17))
    assert(df(2) % 2001 - 1000 === SimilaritySearch.planeWeight(7, 63))
  }
}
