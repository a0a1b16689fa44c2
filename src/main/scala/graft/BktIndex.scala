package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{dist, TopKByDistance}
import graft.operators.{BalancedKMeans, Knn, KnnGraph, Mutations}

/** BKT-algo index facade — the reference's DEFAULT in-memory algorithm
  * (`IndexAlgoType::BKT`, `BKT/BKTIndex.cpp`): a balanced k-means cluster
  * tree for query entry plus an RNG-refined neighborhood graph for precise
  * expansion. Third sibling of [[AnnIndex]] (SPANN) and [[KdtIndex]] (KDT)
  * behind the same `CoreInterface.h:14-87` phase surface:
  * build / search / add / delete / needRefine / refine / save / load.
  *
  * Search composes the two oracle-gated primitives end-to-end:
  * 1. cluster probe (the tree-descent seed phase, `BKTree.h:132-154`
  *    SearchTrees): nearest `nprobe` centers per query → exact top-`seeds`
  *    within the probed clusters;
  * 2. graph walk ([[KnnGraph.searchGraph]], `BKTIndex.cpp:149-207`):
  *    level-synchronous beam expansion over the neighborhood graph, which
  *    recovers neighbors OUTSIDE the probed clusters — the property that
  *    separates BKT search from plain IVF.
  *
  * Mutation semantics mirror the reference: `add` appends — new vectors
  * take their nearest cluster and link into the graph by exact top-`nbr`
  * search (both directions, `NeighborhoodGraph.h:146-199` insertion);
  * cluster centers and existing RNG prunes change only on refine/build.
  * `delete` tombstones; search drops tombstoned nodes at the score join
  * (they still conduct expansion in the reference too until refine).
  *
  * Scale posture: centers are k rows (broadcast); the cluster probe is one
  * assign-shaped join against the corpus-partitioned `assign` frame; every
  * walk round broadcasts a |queries|×beam frontier against the edges table
  * — stored edges are bucketed by `src % EdgeBuckets` and the probe join
  * keys on the bucket, so loaded-index rounds dynamic-partition-prune to
  * the frontier's buckets.
  */
class BktIndex private (
    val spark: SparkSession,
    val dim: Int,
    val kClusters: Int,
    val nbr: Int,
    val nprobe: Int,
    val seeds: Int,
    val beam: Int,
    val rounds: Int,
    val metric: String,
    val vectors: DataFrame,
    val deleted: DataFrame,
    val centers: Option[DataFrame],
    val assign: Option[DataFrame], // (id, cluster_id)
    val edges: Option[DataFrame], // (src, dst) [+ src_bucket when stored]
    val srcBuckets: Option[Int] = None) {

  private def copy(
      vectors: DataFrame = vectors,
      deleted: DataFrame = deleted,
      centers: Option[DataFrame] = centers,
      assign: Option[DataFrame] = assign,
      edges: Option[DataFrame] = edges,
      srcBuckets: Option[Int] = srcBuckets): BktIndex =
    new BktIndex(spark, dim, kClusters, nbr, nprobe, seeds, beam, rounds,
      metric, vectors, deleted, centers, assign, edges, srcBuckets)

  def count: Long = Mutations.liveView(vectors, deleted).count()

  private def live: DataFrame =
    Mutations.liveView(vectors.select(col("id"), col("vec")), deleted)

  /** BuildIndex (`BKTIndex.cpp:268-283`): cluster tree + kNN graph + RNG
    * refine.
    */
  def build(maxIter: Int = 3, trees: Int = 2, planes: Int = 8): BktIndex = {
    val l = live
    val c = BalancedKMeans.fit(l, kClusters, maxIter, metric = metric)
    val a = BalancedKMeans.assign(l, c, metric = metric)
      .select(col("id"), col("cluster_id"))
    val g = KnnGraph.build(l, dim, nbr, trees, planes, metric)
    val refined = KnnGraph.rngRefine(g, l, maxNeighbors = nbr)
      .select(col("src"), col("dst"))
    copy(centers = Some(c), assign = Some(a), edges = Some(refined),
      srcBuckets = None)
  }

  private def requireBuilt(): (DataFrame, DataFrame, DataFrame) =
    (centers, assign, edges) match {
      case (Some(c), Some(a), Some(e)) => (c, a, e)
      case _ => throw new IllegalStateException(
        "index not built — call build() first")
    }

  /** The tree-descent seed phase: nearest `nprobe` centers per query, exact
    * top-`seeds` within the probed clusters' live members.
    */
  private def seedFrame(queries: DataFrame): DataFrame = {
    val (c, a, _) = requireBuilt()
    val probed = queries.crossJoin(broadcast(c))
      .withColumn("cdist",
        dist.byName(metric)(col("qvec"), col("center")))
      .groupBy(col("query_id"))
      .agg(TopKByDistance.topk(col("cluster_id"), col("cdist"), nprobe).as("cl"))
      .select(col("query_id"), explode(col("cl")).as("c"))
      .select(col("query_id"), col("c.id").as("cluster_id"))
    val liveAssign = Mutations.liveView(a, deleted)
    broadcast(probed)
      .join(liveAssign, Seq("cluster_id"))
      .join(live.select(col("id"), col("vec")), Seq("id"))
      .join(broadcast(queries), Seq("query_id"))
      .withColumn("d", dist.byName(metric)(col("qvec"), col("vec")).cast("double"))
      .groupBy(col("query_id"))
      .agg(TopKByDistance.topk(col("id"), col("d"), seeds).as("nn"))
      .select(col("query_id"), explode(col("nn")).as("r"))
      .select(col("query_id"), col("r.id").as("id"),
        col("r.dist").cast("double").as("dist"))
  }

  /** SearchIndex: cluster-probe seeds + graph walk over the live corpus. */
  def search(queries: DataFrame, k: Int): DataFrame = {
    val (_, _, e) = requireBuilt()
    KnnGraph.searchGraph(queries, live, e, k,
      seeds = seeds, beam = beam, rounds = rounds, metric = metric,
      seedFrame = Some(seedFrame(queries)), srcBuckets = srcBuckets)
  }

  def batchSearch(queries: DataFrame, k: Int): DataFrame = search(queries, k)

  /** GetIterator on the BKT path (`BKTIndex.cpp:354-427` SearchIterative):
    * one walk with budget `maxK` feeds a retained [[operators.ResultIterator]];
    * batches past `exactBudget` carry the relaxed-monotonicity flag (the
    * walk's order is no longer provably global past the check budget).
    */
  def iterate(queries: DataFrame, exactBudget: Int, maxK: Int): operators.ResultIterator = {
    val ranked = search(queries, maxK)
      .withColumn("relaxed_mono", col("rank") > exactBudget)
      .cache()
    new operators.ResultIterator(ranked, maxK)
  }

  /** SearchIndexWithFilter (`BKTIndex.cpp:623-647`): non-passing vectors
    * still conduct the walk (seed, score, expand — the reference traverses
    * them too) but never reach the result top-k.
    */
  def searchFiltered(queries: DataFrame, k: Int, passingIds: DataFrame): DataFrame = {
    val (_, _, e) = requireBuilt()
    KnnGraph.searchGraph(queries, live, e, k,
      seeds = seeds, beam = beam, rounds = rounds, metric = metric,
      seedFrame = Some(seedFrame(queries)), srcBuckets = srcBuckets,
      emitFilter = Some(passingIds))
  }

  /** AddIndex: append vectors, assign each to its nearest existing center,
    * link into the graph via exact top-`nbr` over the live corpus — both
    * directions, the reference's insertion that lets neighbor lists grow
    * past `nbr` until refine.
    */
  def add(batch: DataFrame): BktIndex = {
    val (c, a, e) = requireBuilt()
    val b = batch.select(col("id"), col("vec"))
    val newAssign = BalancedKMeans.assign(b, c, metric = metric)
      .select(col("id"), col("cluster_id"))
    val asQueries = b.select(col("id").as("query_id"), col("vec").as("qvec"))
    val links = Knn.search(asQueries, live, nbr, metric)
      .select(col("query_id").as("src"), col("id").as("dst"))
      .where(col("src") =!= col("dst"))
    val newEdges = links.unionByName(
      links.select(col("dst").as("src"), col("src").as("dst")))
    val withBucket = srcBuckets match {
      case Some(nB) =>
        newEdges.withColumn("src_bucket", pmod(col("src"), lit(nB)).cast("int"))
      case None => newEdges
    }
    copy(
      vectors = vectors.select(col("id"), col("vec")).unionByName(b),
      assign = Some(a.unionByName(newAssign)),
      edges = Some(e.unionByName(withBucket)))
  }

  def deleteByIds(ids: Seq[Long]): BktIndex = {
    import spark.implicits._
    copy(deleted = deleted.unionByName(ids.toDF("id")).distinct())
  }

  /** NeedRefine: tombstone fraction over the stored corpus. */
  def needRefine(threshold: Double = 0.4): Boolean = {
    val total = vectors.count()
    total > 0 && deleted.count().toDouble / total > threshold
  }

  /** RefineIndex: drop tombstones, rebuild tree and graph. */
  def refineIndex(): BktIndex =
    new BktIndex(spark, dim, kClusters, nbr, nprobe, seeds, beam, rounds,
      metric, live, BktIndex.emptyDeletes(spark), None, None, None).build()

  /** SaveIndex: vectors + tombstones + centers + assignment + the graph laid
    * out by `src_bucket` so loaded-index walks partition-prune their edge
    * scans.
    */
  def save(dir: String, edgeBuckets: Int = 32): Unit = {
    val (c, a, e) = requireBuilt()
    vectors.write.mode("overwrite").parquet(s"$dir/vectors")
    deleted.write.mode("overwrite").parquet(s"$dir/deletes")
    c.write.mode("overwrite").parquet(s"$dir/centers")
    a.write.mode("overwrite").parquet(s"$dir/assign")
    e.select(col("src"), col("dst"))
      .withColumn("src_bucket", pmod(col("src"), lit(edgeBuckets)).cast("int"))
      .repartition(col("src_bucket"))
      .write.mode("overwrite").partitionBy("src_bucket")
      .parquet(s"$dir/edges")
    val p = new org.apache.hadoop.fs.Path(s"$dir/bkt_config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(
      (s"""{"dim":$dim,"kClusters":$kClusters,"nbr":$nbr,"nprobe":$nprobe,""" +
        s""""seeds":$seeds,"beam":$beam,"rounds":$rounds,""" +
        s""""edgeBuckets":$edgeBuckets,"metric":"$metric"}""")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}

object BktIndex {

  private def emptyDeletes(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[Long].toDF("id")
  }

  def apply(
      spark: SparkSession,
      vectors: DataFrame,
      dim: Int,
      kClusters: Int = 8,
      nbr: Int = 8,
      nprobe: Int = 2,
      seeds: Int = 4,
      beam: Int = 8,
      rounds: Int = 3,
      metric: String = "l2sq"): BktIndex =
    new BktIndex(spark, dim, kClusters, nbr, nprobe, seeds, beam, rounds,
      metric, vectors.select(col("id"), col("vec")), emptyDeletes(spark),
      None, None, None)

  def load(spark: SparkSession, dir: String): BktIndex = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/bkt_config.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    def field(key: String): String =
      s""""$key":\\s*"?([^,}"]+)"?""".r.findFirstMatchIn(json)
        .map(_.group(1)).getOrElse(throw new IllegalArgumentException(
          s"missing $key in $dir/bkt_config.json"))
    new BktIndex(spark, field("dim").toInt, field("kClusters").toInt,
      field("nbr").toInt, field("nprobe").toInt, field("seeds").toInt,
      field("beam").toInt, field("rounds").toInt, field("metric"),
      spark.read.parquet(s"$dir/vectors"),
      spark.read.parquet(s"$dir/deletes"),
      Some(spark.read.parquet(s"$dir/centers")),
      Some(spark.read.parquet(s"$dir/assign")),
      Some(spark.read.parquet(s"$dir/edges")),
      srcBuckets = Some(field("edgeBuckets").toInt))
  }
}
