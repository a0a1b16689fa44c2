package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-layer semantics as batch dataflows (V1/V2,
  * `src/Server/SearchExecutor.cpp:36-120`,
  * `src/Aggregator/AggregatorService.cpp:285-414`).
  *
  * V1: a request names target indices (`$index:` option) — here a queries
  * frame with an `index_name` column fans out over a map of named indices
  * and returns per-index result lists.
  *
  * V2: the reference's aggregator CONCATENATES per-server results without
  * re-ranking; Spark's shuffle IS the gather, and we additionally re-rank
  * globally (a strict improvement the survey calls out).
  */
object Serving {

  /** Per-index search: queries carry `index_name` (null = all indices,
    * matching SearchExecutor's SelectIndex fallback). Output gains an
    * `index_name` column.
    */
  def multiIndexSearch(
      queries: DataFrame, // (query_id, qvec, index_name)
      indices: Map[String, DataFrame], // name -> corpus (id, vec)
      k: Int,
      metric: String = "l2sq"): DataFrame =
    indices.map { case (name, corpus) =>
      val sel = queries.where(col("index_name").isNull || col("index_name") === name)
        .select(col("query_id"), col("qvec"))
      Knn.search(sel, corpus, k, metric).withColumn("index_name", lit(name))
    }.reduce(_ unionByName _)

  /** Scatter-gather with global re-merge: per-partition (≡ per-server)
    * top-k, then one global top-k over the union — the k·partitions rows are
    * all that moves. `partitioned` is the corpus already split by any
    * partitioning (B14's balanced partition, or Spark's own).
    */
  def scatterGather(
      queries: DataFrame,
      partitionedCorpora: Seq[DataFrame],
      k: Int,
      metric: String = "l2sq"): DataFrame = {
    // per-server results stay UNROUNDED so the global re-merge ranks on raw
    // distance — identical to a single exact top-k over the whole corpus
    val perServer = partitionedCorpora.map(c =>
      Knn.searchAgg(queries, c, k, metric)
        .select(col("query_id"), explode(col("nn")).as("r"))
        .select(col("query_id"), col("r.id").as("id"), col("r.dist").as("dist")))
    val unioned = perServer.reduce(_ unionByName _)
    Knn.explodeRanked(
      unioned.groupBy(col("query_id"))
        .agg(graft.functions.TopKByDistance.topk(col("id"), col("dist"), k).as("nn")))
  }

  /** Degraded-mode scatter-gather — the reference aggregator's PARTIAL
    * aggregation (`AggregatorService.cpp:285-340`): a per-server callback
    * that times out or fails the network marks that server's slot
    * Timeout/FailedNetwork and `AggregateResults` merges whatever
    * succeeded. Here the failed set is explicit (`failedShards` — batch
    * dataflows don't time out mid-plan; the caller's health checker names
    * the dead shards) and the result is EXACTLY the top-k over the
    * surviving shards, annotated with `(n_shards_ok, n_shards)` so a
    * client can tell a degraded answer from a full one — the same signal
    * the reference's per-slot ResultStatus carries.
    *
    * Scale shape: identical to [[scatterGather]] minus the dead shards —
    * per-shard bounded top-k, one k·shards-row re-merge; the annotation is
    * two literals.
    */
  def scatterGatherPartial(
      queries: DataFrame,
      partitionedCorpora: Seq[DataFrame],
      k: Int,
      failedShards: Set[Int],
      metric: String = "l2sq"): DataFrame = {
    val alive = partitionedCorpora.zipWithIndex
      .collect { case (c, i) if !failedShards(i) => c }
    require(alive.nonEmpty, "every shard failed — nothing to aggregate")
    scatterGather(queries, alive, k, metric)
      .withColumn("n_shards_ok", lit(alive.size))
      .withColumn("n_shards", lit(partitionedCorpora.size))
  }
}
