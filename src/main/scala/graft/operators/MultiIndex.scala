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
}
