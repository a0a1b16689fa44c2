package graft

import org.apache.spark.sql.functions._

import graft.operators.MultiIndex

/** Q7 multi-index weighted scan + its streaming iterator facade — mirrors
  * `Test/src/MultiIndexScanTest.cpp:36-62`: build indexes over several
  * vector columns, scan with a rank function, drain `Next()` until empty.
  */
class MultiIndexSpec extends SparkSpec {

  private def corpus = spark.range(100).select(
    col("id"),
    transform(sequence(lit(1), lit(4)), _ => col("id").cast("double")).as("va"),
    transform(sequence(lit(1), lit(4)), _ => (lit(200) - col("id")).cast("double")).as("vb"))

  private val targets = Seq(Array.fill(4)(10.0), Array.fill(4)(150.0))
  private val weights = Seq(1.0, 0.5)

  test("weightedScan returns the exact weighted top-k in ascending score order") {
    val got = MultiIndex.weightedScan(corpus, Seq("va", "vb"), targets, weights, 10)
      .orderBy("rank").collect()
    assert(got.length === 10)
    assert(got.map(_.getInt(0)).toSeq === (1 to 10))
    val scores = got.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a <= b })
    // hand-check the optimum: score(id) = 4·(id−10)² + 0.5·4·(200−id−150)²,
    // minimized between 10 and 50 → argmin at id = (2·10 + 50)/3 = 23.33 → 23
    assert(got.head.getLong(1) === 23L)
  }

  test("scanIterator streams the weighted top-k in batches (MultiIndexScanTest Next loop)") {
    val it = MultiIndex.scanIterator(
      corpus, Seq("va", "vb"), targets, weights, k = 10, termCond = 10)
    val expected = MultiIndex.weightedScan(
      corpus, Seq("va", "vb"), targets, weights, 10)
      .orderBy("rank").collect().map(r => (r.getInt(0), r.getLong(1)))
    // the reference test drains Next() one result at a time, up to 100 calls
    val drained = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    var calls = 0
    while (it.hasNext && calls < 100) {
      val batch = it.next(1).collect()
      assert(batch.length <= 1)
      drained ++= batch.map(r => (r.getInt(0), r.getLong(1)))
      calls += 1
    }
    assert(calls === 10, "exact stream terminates at exactly k Next calls")
    assert(drained.toSeq === expected.toSeq,
      "streamed results must equal the one-shot weighted scan, in order")
    assert(!it.hasNext)
    assert(it.next(1).collect().isEmpty, "drained iterator serves empty frames")
    it.close()
  }

  test("scanIterator batches are disjoint and contiguous") {
    val it = MultiIndex.scanIterator(
      corpus, Seq("va", "vb"), targets, weights, k = 9)
    val b1 = it.next(4).collect().map(_.getInt(0)).toSet
    val b2 = it.next(4).collect().map(_.getInt(0)).toSet
    val b3 = it.next(4).collect().map(_.getInt(0)).toSet
    assert(b1 === (1 to 4).toSet && b2 === (5 to 8).toSet && b3 === Set(9))
    assert(!it.hasNext)
    it.close()
  }
}
