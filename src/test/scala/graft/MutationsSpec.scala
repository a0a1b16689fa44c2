package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Mutations, Spann}

/** Add/delete/merge/refine semantics (M1-M4, B10/B11; mirrors the
  * add→search→delete→search phases of `Test/src/AlgoTest.cpp`).
  */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  test("add then search finds the new vector (M1 first-add path)") {
    val base = synthVectors(100)
    val novel = Seq((5000L, Seq.fill(10)(9999f), "new")).toDF("id", "vec", "meta")
    val grown = Mutations.add(base, novel)
    val q = Seq((0L, Seq.fill(10)(9998f))).toDF("query_id", "qvec")
    val top1 = Knn.search(q, grown, 1).head()
    assert(top1.getLong(2) === 5000L)
  }

  test("merge is last-write-wins on id (B11)") {
    val a = Seq((1L, Seq(1f), "old"), (2L, Seq(2f), "keep")).toDF("id", "vec", "meta")
    val b = Seq((1L, Seq(10f), "new")).toDF("id", "vec", "meta")
    val m = Mutations.merge(a, b).orderBy("id").collect()
    assert(m.length === 2)
    assert(m(0).getString(2) === "new")
    assert(m(1).getString(2) === "keep")
  }

  test("deleteByVector tombstones exact duplicates only (M3, dist<1e-6)") {
    val corpus = synthVectors(50)
    val targets = corpus.where(col("id") === 7)
      .select(col("id").as("query_id"), col("vec").as("qvec"))
    val ids = Mutations.deleteByVector(corpus, targets).as[Long].collect().toSet
    assert(ids === Set(7L))
  }

  test("deleteByMeta resolves ids through the meta mapping (M4)") {
    val corpus = synthVectors(50)
    val ids = Mutations.deleteByMeta(corpus, Seq("3", "4").toDF("meta"))
      .as[Long].collect().toSet
    assert(ids === Set(3L, 4L))
  }

  test("liveView excludes tombstones; refine rebuilds without them (B10)") {
    val corpus = synthVectors(200)
    val dels = spark.range(1, 200, 2).toDF("id") // delete odds: 50%
    assert(Mutations.needRefine(corpus, dels, 0.4))
    val (heads, postings) = Mutations.refine(corpus, dels, 10, 2)
    val ids = postings.select("id").distinct().as[Long].collect().toSet
    assert(ids.forall(_ % 2 === 0))
    assert(ids.size === 100)
    assert(heads.count() > 0)
  }
}
