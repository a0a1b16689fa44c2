package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.dist

/** Multi-index weighted top-k scan (Q7, `src/Core/MultiIndexScan.cpp:87-178`).
  *
  * The reference round-robins n ANN iterators and maintains a global heap
  * under a weighted-sum rank function (`WeightedRankFunc`) with a Fagin-style
  * termination test. As a dataflow over a table with several vector columns
  * this is exactly `orderBy(Σ wᵢ·dist(vecᵢ, targetᵢ)).limit(k)` — exact, no
  * iterator dance; Spark plans it as TakeOrderedAndProject (per-partition
  * top-k + driver merge of k·tasks rows — no global sort shuffle).
  */
object MultiIndex {

  /** corpus with vector columns `vecCols(i)`; `targets(i)` are literal query
    * vectors; result `(rank, id, score)` with score = Σ wᵢ·distᵢ rounded 4dp.
    */
  def weightedScan(
      corpus: DataFrame,
      vecCols: Seq[String],
      targets: Seq[Array[Double]],
      weights: Seq[Double],
      k: Int,
      metric: String = "l2sq"): DataFrame = {
    require(vecCols.length == targets.length && targets.length == weights.length)
    val score: Column = vecCols.indices.map { i =>
      val t = array(targets(i).map(v => lit(v)).toIndexedSeq: _*)
      lit(weights(i)) * dist.byName(metric)(col(vecCols(i)), t)
    }.reduce(_ + _)
    // single-group bounded top-k: partial-aggregates per task (k rows each)
    // instead of a global sort — survives an arbitrarily large corpus
    corpus
      .withColumn("score", score)
      .groupBy(lit(1).as("_g"))
      .agg(graft.functions.TopKByDistance.topk(col("id"), col("score"), k).as("nn"))
      .select(posexplode(col("nn")).as(Seq("pos", "r")))
      .select(
        (col("pos") + 1).cast("int").as("rank"),
        col("r.id").as("id"),
        round(col("r.dist"), 4).as("score"))
  }

  /** Streaming facade over [[weightedScan]] — the reference's
    * `MultiIndexScan::Next`/`Close` handle (`src/Core/MultiIndexScan.cpp:
    * 87-178`, exercised by `Test/src/MultiIndexScanTest.cpp:36-62`): results
    * stream out smallest weighted score first, one batch per `next` call,
    * from a retained workspace ([[graft.operators.ResultIterator]]'s
    * pattern — computed once, sliced per call, `close()` releases it).
    *
    * Termination budget: the reference round-robins per-index ANN iterators
    * and stops after `termCondVal` consecutive candidates fail to improve
    * the heap (or a timer / `searchLimit` seen-set cap) — an
    * early-termination HEURISTIC whose result may miss true top-k entries.
    * Here the scan is exact (one bounded top-k pass over the corpus), so
    * the stream is already globally ordered and terminates at exactly `k`
    * rows: `termCond` is accepted for API parity and recorded on the handle,
    * but cannot change the (strictly better) exact results — the same
    * exact-improvement adjudication as q10's weightedScan itself.
    */
  def scanIterator(
      corpus: DataFrame,
      vecCols: Seq[String],
      targets: Seq[Array[Double]],
      weights: Seq[Double],
      k: Int,
      metric: String = "l2sq",
      termCond: Int = 10): MultiIndexScanIterator = {
    val ranked = weightedScan(corpus, vecCols, targets, weights, k, metric).cache()
    new MultiIndexScanIterator(ranked, k, termCond)
  }
}

/** Handle for [[MultiIndex.scanIterator]]: serves successive batches of the
  * weighted top-k in ascending-score order. Batches are disjoint and
  * contiguous; `next` past `k` (or past the corpus size) returns an empty
  * frame, `hasNext` mirrors the reference's stream-out stack draining.
  */
final class MultiIndexScanIterator private[operators] (
    ranked: DataFrame, k: Int, val termCond: Int) {
  // the ranked frame is cached and holds ≤ k rows: count it ONCE at
  // construction (the stream may run out BELOW k when the corpus is smaller
  // than k) so `next` is a pure slice — no per-batch drain-probe job
  private val available: Long = math.min(ranked.count(), k.toLong)
  private var offset = 0

  def next(batch: Int): DataFrame = {
    require(batch > 0, s"batch must be positive, got $batch")
    val out = ranked.where(col("rank") > offset && col("rank") <= offset + batch)
    offset = math.min(offset + batch, k)
    out
  }

  def hasNext: Boolean = offset < available

  /** Release the retained workspace (reference `MultiIndexScan::Close`). */
  def close(): Unit = { ranked.unpersist(); () }
}
